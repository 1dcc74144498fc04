"""Fetch the ImageNet-pretrained HRNet-W48 weights and convert them to a
values_tpu-ready flax pytree.

The reference trains GTA/Cityscapes HRNet from the public
``hrnetv2_w48_imagenet_pretrained.pth`` (reference:
uncertainty_modeling/models/hrnet_module.py:682-695 loads it via
``MODEL.PRETRAINED``). This environment has no network egress, so the
script (1) documents the official sources, (2) converts an
already-downloaded ``.pth`` with the tested importer
(values_tpu.models.torch_import.hrnet_params_from_torch +
merge_pretrained_hrnet), and (3) optionally attempts the download when
run on a connected machine.

Usage:
    python scripts/fetch_hrnet_pretrained.py --pth <downloaded.pth> \
        --out hrnetv2_w48_imagenet.flax.pkl
    python scripts/fetch_hrnet_pretrained.py --download --out ...
Then train with ``MODEL.PRETRAINED=<out>``.
"""
import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Official mirrors (HRNet-Image-Classification release; also mirrored by
# the HRNet-Semantic-Segmentation project the reference builds on)
URLS = [
    "https://github.com/HRNet/HRNet-Image-Classification/releases/"
    "download/PretrainedWeights/HRNet_W48_C_ssld_pretrained.pth",
    "https://opr0mq.dm.files.1drv.com/y4mIoWpP2n-LUohHHANpC0jrOixm1FZgO2OsUtP2DwIozH5RsoYVyv_De5wDgR6XuQmirMV3C0AljLeB-zQXevfLlnQpcNeJlT9Q8LwNYDwh3TsECkMTWXCUn3vDGJWpCxQcQWKONr5VQWO1hLEKPeJbbSZ6tgbWwJHgHF7592HY7ilmGe39o5BhHz7P9QqMYLBts6V7QGoaKrr0PL3wvvR4w",
]


def convert(pth_path: str, out_path: str) -> None:
    import torch
    import numpy as np
    state = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "state_dict" in state:
        state = state["state_dict"]
    from values_tpu.models.torch_import import hrnet_params_from_torch
    variables = hrnet_params_from_torch(state)
    with open(out_path, "wb") as f:
        pickle.dump({"format": "values_tpu_pretrained_hrnet",
                     "variables": variables}, f)
    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree_util.tree_leaves(variables))
    print(f"wrote {out_path} ({n / 1e6:.1f}M params)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", help="already-downloaded torch .pth")
    ap.add_argument("--download", action="store_true",
                    help="attempt the download (needs network egress)")
    ap.add_argument("--out", default="hrnetv2_w48_imagenet.flax.pkl")
    args = ap.parse_args()
    pth = args.pth
    if pth is None and args.download:
        import urllib.request
        for url in URLS:
            try:
                print("fetching", url.split("/")[-1][:60], "...")
                pth, _ = urllib.request.urlretrieve(url,
                                                    "hrnet_w48.pth")
                break
            except Exception as exc:  # try the next mirror
                print("  failed:", exc)
        if pth is None:
            raise SystemExit("all mirrors failed (no egress?)")
    if pth is None:
        raise SystemExit("pass --pth <file> or --download")
    convert(pth, args.out)


if __name__ == "__main__":
    main()

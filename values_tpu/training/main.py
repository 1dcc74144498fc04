"""Training CLI.

Reference entry: ``python uncertainty_modeling/main.py [hydra overrides]``
(reference: uncertainty_modeling/main.py:33-88). Ours:

    python -m values_tpu.training.main --config-name softmax_config \
        [--config-dir configs] [key=value ...]

Environment overrides match the reference: DATASET_LOCATION,
EXPERIMENT_LOCATION, LSB_JOBID -> version.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

from ..config import compose
from .loops import fit

DEFAULT_CONFIG_DIR = str(Path(__file__).resolve().parents[2] / "configs")


def main(argv=None) -> None:
    from ..core.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    # multi-host runtime first — before anything touches the XLA backend
    from ..parallel.mesh import initialize_distributed
    initialize_distributed()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", "-cn", default="softmax_config")
    parser.add_argument("--config-dir", "-cd", default=DEFAULT_CONFIG_DIR)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    cfg = compose(args.config_dir, args.config_name, args.overrides)
    ckpt = fit(cfg)
    print(f"Training done. Final checkpoint: {ckpt}")


if __name__ == "__main__":
    main()

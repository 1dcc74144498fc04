"""Host input-pipeline throughput: batch-assembly rate vs worker count.

Measures NumpyBatchLoader (crop + rater choice + mirror/noise via the
native C++ ops) on a synthetic 64^3 dataset — the host-side half of the
VERDICT r1 item 8 question ("prove the host pipeline feeds the chip").
The device half depends on the deployment host's H2D path; on this
container the TPU sits behind a relay tunnel (multi-hundred-ms per
transfer), so host assembly rate vs the chip's step time is the honest
comparable: a v5e training step at batch 8 / 64^3 f32 is ~50-100 ms, so
the pipeline keeps the chip fed iff assembly reaches ~100+ vol/s.

Run: python scripts/bench_loader.py [n_volumes]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    import tempfile
    from values_tpu.data.pipeline import NumpyBatchLoader

    rs = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="loaderbench")
    samples = []
    for i in range(n):
        img = Path(tmp) / f"v{i}.npy"
        np.save(img, rs.rand(70, 70, 70).astype(np.float32))
        raters = []
        for r in range(4):
            lab = Path(tmp) / f"v{i}_{r:02d}.npy"
            np.save(lab, (rs.rand(70, 70, 70) > 0.5).astype(np.int32))
            raters.append(str(lab))
        samples.append({"image_path": str(img), "label_paths": raters})

    print(f"{n} volumes 70^3, batch 8, patch 64, augment=True")
    print(f"{'workers':>8} {'vol/s':>8} {'ms/batch':>9}")
    for workers in (0, 1, 2, 4, 8, 16):
        loader = NumpyBatchLoader(samples, batch_size=8, patch_size=64,
                                  training=True, augment=True, seed=1,
                                  num_workers=workers)
        for _ in loader:  # warm the page cache
            pass
        t0 = time.perf_counter()
        epochs = 3
        count = 0
        for _ in range(epochs):
            for batch in loader:
                count += len(batch["data"])
        dt = time.perf_counter() - t0
        print(f"{workers:>8} {count / dt:>8.1f} "
              f"{dt / (count / 8) * 1e3:>9.1f}")


if __name__ == "__main__":
    main()

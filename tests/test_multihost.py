"""Real multi-process (2-host emulation) smoke test over localhost.

Spawns two OS processes, each with 4 virtual CPU devices (8 global),
connected through ``jax.distributed`` — the closest thing to a 2-slice
pod this container can exercise. Each process:

1. calls ``initialize_distributed()`` BEFORE any backend touch (the
   ordering contract fixed in r2),
2. builds the granule-major hybrid mesh (dcn_data=2),
3. assembles the identical global batch and stages it with
   ``_device_batch`` (make_array_from_callback across non-addressable
   devices),
4. runs one sharded train step and checks the replicated loss agrees.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO"])
    from values_tpu.parallel.mesh import initialize_distributed
    n = initialize_distributed()
    assert n == 2, n

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == 2

    from values_tpu.config import make_config
    from values_tpu.parallel.mesh import (batch_sharding, make_hybrid_mesh,
                                          make_parallel_train_step)
    from values_tpu.training.experiment import Experiment
    from values_tpu.training.loops import _device_batch

    mesh = make_hybrid_mesh(n_sample=1, dcn_data=2)
    assert mesh.shape == {"data": 8, "sample": 1}

    cfg = make_config({
        "model": {"_target_": "values_tpu.models.unet3d.UNet3D",
                  "num_classes": 2, "initial_filter_size": 2},
        "datamodule": {"ignore_index": 0},
        "learning_rate": 1e-3, "seed": 1,
    })
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
    state = jax.device_put(state, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    step = make_parallel_train_step(exp, mesh)

    rs = np.random.RandomState(0)  # identical batch on both hosts
    batch = {"data": rs.rand(8, 16, 16, 16, 1).astype(np.float32),
             "seg": (rs.rand(8, 16, 16, 16) > 0.5).astype(np.int32)}
    dev_batch = _device_batch(batch, batch_sharding(mesh))
    state, loss = step(state, dev_batch, jax.random.PRNGKey(2), False)
    print("LOSS", float(loss), flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_hybrid_mesh_train_step(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # strip the axon sitecustomize (PYTHONPATH): it eagerly
        # initializes the TPU backend at interpreter start, which
        # forecloses jax.distributed.initialize in the workers
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon_site" not in p)
        env.update({
            "REPO": str(Path(__file__).resolve().parents[1]),
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
    losses = [[l for l in out.splitlines() if l.startswith("LOSS")][-1]
              for out in outs]
    assert losses[0] == losses[1], losses  # replicated loss agrees


FIT_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO"])
    from values_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed() == 2

    import jax
    jax.config.update("jax_platforms", "cpu")
    from values_tpu.config import compose
    from values_tpu.training.loops import fit

    cfg = compose(os.path.join(os.environ["REPO"], "configs"),
                  "softmax_config", [
        "data_input_dir=" + os.environ["DATA"],
        "save_dir=" + os.environ["EXP"],
        "max_epochs=" + os.environ.get("MAX_EPOCHS", "1"),
        "batch_size=8", "datamodule.patch_size=16",
        "datamodule.batch_size=8", "datamodule.data_num_folds=3",
        "datamodule.num_raters=2", "model.initial_filter_size=2",
        "version=mh", "+devices=8", "+dcn_granules=2",
        "+checkpoint_format=" + os.environ.get("CKPT_FMT", "pickle")])
    ckpt = fit(cfg)
    print("CKPT", ckpt, flush=True)
""")


@pytest.mark.slow
@pytest.mark.parametrize("ckpt_fmt", ["pickle", "orbax", "orbax-async"])
def test_two_process_full_fit(tmp_path, ckpt_fmt):
    """A REAL 2-process fit(): covers the multi-host paths one train
    step cannot — replicated val staging, process-0-only checkpoint and
    TensorBoard writers, the prepare_data barrier. (The r2 code review
    found the val loop and checkpoint writers were multi-host-broken;
    this is the regression net.) The orbax variant exercises the
    COLLECTIVE save path (VERDICT r2 item 6: all processes call save,
    one commits) plus read-back. The orbax-async variant (VERDICT r3
    item 10) runs TWO epochs so successive background saves exercise the
    one-in-flight drain and the coordination-service commit barriers."""
    if ckpt_fmt.startswith("orbax"):
        pytest.importorskip("orbax.checkpoint")
    import random
    import numpy as np
    from values_tpu.data.toy_generation import ToyGenConfig, generate_samples

    data = tmp_path / "data"
    case = data / "Case_1"
    for split, n in (("Tr", 16), ("Ts", 2)):
        gen = ToyGenConfig(
            input_files=["ballSphere.stl"],
            save_path=str(case / f"images{split}"), n_samples=n,
            image_size=(16, 16, 16), min_object_ratio=5,
            max_object_ratio=2, gauss_sigma=2, blur=True,
            segmentation=True, n_raters=2, seed=11)
        random.seed(gen.seed)
        np.random.seed(gen.seed)
        generate_samples(gen)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()

    port = _free_port()
    worker_py = tmp_path / "fit_worker.py"
    worker_py.write_text(FIT_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon_site" not in p)
        env.update({
            "REPO": str(Path(__file__).resolve().parents[1]),
            "DATA": str(data), "EXP": str(tmp_path / "exp"),
            "CKPT_FMT": ckpt_fmt,
            "MAX_EPOCHS": "2" if ckpt_fmt == "orbax-async" else "1",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2", "PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
    ckpts = {[l for l in out.splitlines()
              if l.startswith("CKPT")][-1] for out in outs}
    assert len(ckpts) == 1  # both agree on the checkpoint path
    ckpt_path = next(iter(ckpts)).split(" ", 1)[1]
    from values_tpu.training.checkpoint import load_checkpoint
    payload = load_checkpoint(ckpt_path)
    assert payload["epoch"] == (1 if ckpt_fmt == "orbax-async" else 0)

"""Multi-host input sharding: per-process index slicing and global-array
assembly via jax.make_array_from_process_local_data.

Real pods run one process per host; here the index math is validated by
simulating P logical processes inside one process, and the assembly path
runs on the virtual 8-device mesh (single process == the degenerate case
the API must also support).
"""

import os
import numpy as np
import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.datasets.loader import (
    BatchLoader, process_local_indices,
)
from music_style_transfer_ldm_tpu.parallel import (
    global_batch_from_local, make_mesh, shard_batch,
)


def test_process_local_indices_partition():
    """P slices are contiguous, equal-shaped, and concatenate to the
    (tail-padded) global batch in order."""
    g = np.arange(100, 113)  # 13 rows, P=4 -> per-process 4, 3 pad rows
    slices = [process_local_indices(g, p, 4) for p in range(4)]
    assert all(len(s) == 4 for s in slices)
    merged = np.concatenate(slices)
    np.testing.assert_array_equal(merged[:13], g)
    np.testing.assert_array_equal(merged[13:], [112, 112, 112])  # pad=last
    # Divisible batch: exact partition, no padding.
    g2 = np.arange(8)
    merged2 = np.concatenate(
        [process_local_indices(g2, p, 2) for p in range(2)])
    np.testing.assert_array_equal(merged2, g2)


def test_process_local_indices_validates_range():
    import pytest
    with pytest.raises(ValueError):
        process_local_indices(np.arange(4), 2, 2)


class _ArrayDS:
    def __init__(self, n=40):
        self.data = np.arange(n, dtype=np.float32).reshape(n, 1)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]


def test_batchloader_process_slices_reassemble_global():
    """Two logical processes with identical seeds see the same global
    order; concatenating their local batches reproduces the single-process
    loader's batches."""
    ds = _ArrayDS(40)
    mk = lambda pi, pc: BatchLoader(ds, batch_size=16, shuffle=True, seed=3,
                                    num_threads=1, process_index=pi,
                                    process_count=pc)
    global_batches = list(mk(0, 1))
    p0 = list(mk(0, 2))
    p1 = list(mk(1, 2))
    assert len(global_batches) == len(p0) == len(p1) == 3
    for g, a, b in zip(global_batches, p0, p1):
        merged = np.concatenate([a, b])
        # tail batch (8 rows) is padded to 2x4 per process... 8 divides 2,
        # so every batch partitions exactly here.
        np.testing.assert_array_equal(merged[:len(g)], g)


def test_batchloader_tail_padding_multihost():
    ds = _ArrayDS(10)  # one batch of 8, tail of 2 -> P=4 pads tail to 4
    loaders = [list(BatchLoader(ds, batch_size=8, shuffle=False,
                                num_threads=1, process_index=p,
                                process_count=4))
               for p in range(4)]
    tails = [l[1] for l in loaders]
    assert all(t.shape == (1, 1) for t in tails)
    merged = np.concatenate(tails).ravel()
    np.testing.assert_array_equal(merged, [8, 9, 9, 9])  # pad = last row


def test_global_batch_from_local_single_process_equals_shard_batch(rng):
    mesh = make_mesh((8, 1))
    x = rng.rand(16, 8, 8, 1).astype(np.float32)
    g = global_batch_from_local(x, mesh)
    ref = shard_batch(jnp.asarray(x), mesh, pad=False)
    assert g.shape == ref.shape
    assert g.sharding.is_equivalent_to(ref.sharding, ndim=x.ndim)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_global_batch_from_local_feeds_train_step(rng):
    """A dp train step consumes the assembled global array."""
    import dataclasses
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.training import AETrainer
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    mesh = make_mesh((8, 1))
    trainer = AETrainer(cfg, mesh=mesh, perceptual=False)
    state = trainer.init_state(0)
    x = global_batch_from_local(rng.rand(16, 64, 64, 1).astype(np.float32),
                                mesh)
    state, loss = trainer._train_step(state, x, None)
    assert np.isfinite(float(loss))


def test_packed_gather_process_slicing(tmp_path):
    from music_style_transfer_ldm_tpu.datasets.packed import (
        PackedSpectrogramDataset, write_pack,
    )
    n = 10
    imgs = (np.arange(n)[:, None, None]
            * np.ones((n, 4, 4))).astype(np.uint8)
    write_pack(tmp_path / "t.spk", imgs, np.zeros(n, np.uint16), ["a"])
    ds = PackedSpectrogramDataset(tmp_path / "t.spk", crop=4)
    g = np.arange(10, dtype=np.int64)
    full, _ = ds.gather(g)
    parts = [ds.gather(g, process_index=p, process_count=4)[0]
             for p in range(4)]
    assert all(p.shape == (3, 4, 4, 1) for p in parts)
    merged = np.concatenate(parts)
    np.testing.assert_array_equal(merged[:10], full)
    np.testing.assert_array_equal(merged[10:], np.repeat(full[-1:], 2,
                                                         axis=0))


_WORKER = r'''
"""Two-process jax.distributed worker (REAL multi-process run, Gloo
collectives between separate CPU processes — not virtual devices)."""
import os
import sys

proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_proc, process_id=proc_id)
import dataclasses
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.environ["MSTLDM_REPO"])
from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.parallel import (
    global_batch_from_local, make_mesh,
)
from music_style_transfer_ldm_tpu.training import AETrainer

devs = jax.devices()
assert len(devs) == 2 * n_proc, devs
mesh = make_mesh((len(devs), 1))

# 1) per-process input sharding -> one global array
local = np.full((4, 8, 8, 1), float(proc_id + 1), np.float32)
gb = global_batch_from_local(local, mesh)
assert gb.shape == (4 * n_proc, 8, 8, 1), gb.shape
m = float(jax.jit(jnp.mean)(gb))
assert abs(m - 1.5) < 1e-6, m  # mean over both processes' shards

# 2) a REAL data-parallel train step across the two processes
cfg = default_config()
cfg.train = dataclasses.replace(cfg.train, compute_dtype="float32")
cfg.model = dataclasses.replace(cfg.model, image_size=64)
trainer = AETrainer(cfg, mesh=mesh, perceptual=False)
state = trainer.init_state(0)
rng = np.random.RandomState(proc_id)
x = global_batch_from_local(rng.rand(4, 64, 64, 1).astype(np.float32),
                            mesh)
state, loss = trainer._train_step(state, x, None)
print(f"MH_OK proc={proc_id} mean={m} loss={float(loss):.4f}", flush=True)
'''


def test_two_real_processes_distributed(tmp_path):
    """Spawn TWO separate python processes, initialize jax.distributed
    between them (Gloo over localhost), and run per-host input sharding +
    one data-parallel AE train step spanning both processes' devices.

    This is the multi-host path actually exercised across process
    boundaries, not simulated on virtual devices (SURVEY §2.6/§5
    obligation; docs/ROADMAP.md item 3)."""
    import socket
    import subprocess
    import sys as _sys
    from pathlib import Path

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ, MSTLDM_REPO=repo)
    procs = [subprocess.Popen(
        [_sys.executable, str(worker), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"MH_OK proc={i}" in out, out[-2000:]

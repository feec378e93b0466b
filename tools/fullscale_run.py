"""Reference-recipe training at full scale on the real TPU.

Runs the reference's exact training shape (ref: models/config.py:7,9 +
models/dataset.py:288-296): 4 instruments x 30 min of audio -> 3 s chunks
-> 2,400 mel images -> 15,000 seed-42 pairings; AE pretraining 100 epochs
batch 128, then LDM 202 epochs batch 128 with the frozen pretrained
encoder — fed by the specpack native loader (one mmap gather per batch).

Records what the round-1 demos (256 pairs / batch 32) could not show:
sustained samples/s with the input pipeline under load, the synced
step-time distribution, and loader-vs-device occupancy.

    python tools/fullscale_run.py --workdir runs/fullscale \
        [--seconds 1800] [--pairs 15000] [--ae-epochs 100] [--ldm-epochs 202]
        [--resume-ldm CKPT]

Stages are idempotent: existing dataset artifacts and finished phases are
skipped, so a relay-stall kill can simply be re-run (add --resume-ldm with
the newest runs/ldm/ldm_<epoch> checkpoint to continue mid-phase).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 22050

# Additive-synthesis voices: (harmonic amplitudes, decay/s, vibrato Hz).
# Four distinct timbres standing in for the reference's four instruments
# (ref: data/youtube_urls.csv:2-5 piano/guitar/violin/harp) — the
# environment has no network/ffmpeg for the real downloads.
VOICES = {
    "piano": ([1.0, 0.45, 0.22, 0.1, 0.05], 3.0, 0.0),
    "guitar": ([1.0, 0.6, 0.25, 0.12, 0.08, 0.05], 5.0, 0.0),
    "violin": ([1.0, 0.35, 0.3, 0.15, 0.1], 0.3, 5.5),
    "harp": ([1.0, 0.3, 0.12, 0.04], 7.0, 0.0),
}
SCALE_HZ = [220.0, 246.94, 277.18, 293.66, 329.63, 369.99, 415.3, 440.0,
            493.88, 554.37, 587.33, 659.26]


def synthesize_instrument(name: str, seconds: float,
                          seed: int) -> np.ndarray:
    """Random note sequence with the instrument's harmonic profile."""
    harmonics, decay, vibrato = VOICES[name]
    rng = np.random.RandomState(seed)
    y = np.zeros(int(seconds * SR), np.float32)
    pos = 0
    while pos < len(y):
        dur = rng.uniform(0.2, 1.0)
        n = min(int(dur * SR), len(y) - pos)
        t = np.arange(n) / SR
        f0 = SCALE_HZ[rng.randint(len(SCALE_HZ))] * 2.0 ** rng.randint(-1, 2)
        if vibrato:
            f0 = f0 * (1 + 0.01 * np.sin(2 * np.pi * vibrato * t))
        env = np.exp(-decay * t) * np.minimum(1.0, t * 200.0)
        note = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t)
                   for k, a in enumerate(harmonics))
        y[pos:pos + n] += (0.3 * rng.uniform(0.6, 1.0)
                           * env * note).astype(np.float32)
        pos += n
    return 0.5 * y / max(1e-6, np.abs(y).max())


def prepare_dataset(workdir: Path, seconds: float, pairs: int) -> None:
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    from music_style_transfer_ldm_tpu.data.build_dataset import (
        build_dataset_folder_structure,
    )
    from music_style_transfer_ldm_tpu.datasets import (
        build_pack, generate_pairings,
    )
    dl = workdir / "downloads"
    if not dl.exists():
        for i, name in enumerate(VOICES):
            d = dl / name
            d.mkdir(parents=True)
            t0 = time.time()
            write_wav(d / "session.wav",
                      synthesize_instrument(name, seconds, seed=100 + i), SR)
            print(f"synthesized {name}: {seconds:.0f}s "
                  f"({time.time() - t0:.1f}s)", flush=True)
    img_root = workdir / "processed_images"
    if not img_root.exists():
        n = build_dataset_folder_structure(str(dl), str(img_root),
                                           batch_chunks=128)
        print(f"built {n} spectrogram images", flush=True)
    csv = workdir / "pairings.csv"
    if not csv.exists():
        generate_pairings(img_root, csv, num_pairs=pairs, seed=42)
        print(f"generated {pairs} pairings", flush=True)
    pack = workdir / "train.spk"
    if not pack.exists():
        n = build_pack(img_root, pack)
        print(f"packed {n} items -> {pack} "
              f"({pack.stat().st_size / 1e6:.1f} MB)", flush=True)


def measure_pipeline(trainer, state, loader, n_steps: int = 100,
                     n_synced: int = 50) -> dict:
    """Sustained pipelined throughput + loader occupancy, then a synced
    per-step latency distribution (upper bound: each sync pays the relay
    readback)."""
    import jax
    from music_style_transfer_ldm_tpu.parallel import (
        batch_validity_weights, shard_batch,
    )
    fp = trainer._feature_params()
    n_data = trainer.mesh.shape["data"]
    key = jax.random.PRNGKey(99)

    def prep(batch):
        # No np.asarray: device-resident batches must stay on device.
        (content, _), (style, _) = batch
        w = batch_validity_weights(len(content), n_data, trainer.mesh)
        return (shard_batch(content, trainer.mesh),
                shard_batch(style, trainer.mesh), w)

    # Pipelined pass: no per-step sync; measure time blocked on the loader.
    it = iter(loader)
    batch = next(it)
    steps, fetch_s = 0, 0.0
    t0 = time.perf_counter()
    metrics = None
    while steps < n_steps and batch is not None:
        content, style, w = prep(batch)
        state, metrics = trainer._train_step(
            state, content, style, jax.random.fold_in(key, steps), fp, w)
        steps += 1
        tf = time.perf_counter()
        batch = next(it, None)
        fetch_s += time.perf_counter() - tf
    float(metrics["total_loss"])  # host readback = real sync through relay
    wall = time.perf_counter() - t0
    bsz = loader.batch_size
    result = {
        "pipelined_steps": steps,
        "sustained_samples_per_s": round(steps * bsz / wall, 1),
        "pipelined_step_ms": round(wall / steps * 1000, 2),
        "loader_wait_frac": round(fetch_s / wall, 4),
    }

    # Synced pass: per-step latency distribution.
    times = []
    it = iter(loader)
    for i in range(n_synced):
        batch = next(it, None)
        if batch is None:
            break
        content, style, w = prep(batch)
        t1 = time.perf_counter()
        state, metrics = trainer._train_step(
            state, content, style, jax.random.fold_in(key, 1000 + i), fp, w)
        float(metrics["total_loss"])
        times.append(time.perf_counter() - t1)
    times_ms = np.asarray(times) * 1000
    result.update({
        "synced_steps": len(times),
        "synced_step_ms_p50": round(float(np.percentile(times_ms, 50)), 2),
        "synced_step_ms_p90": round(float(np.percentile(times_ms, 90)), 2),
        "synced_step_ms_p99": round(float(np.percentile(times_ms, 99)), 2),
    })
    return result


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/fullscale")
    p.add_argument("--seconds", type=float, default=1800.0)
    p.add_argument("--pairs", type=int, default=15000)
    p.add_argument("--ae-epochs", type=int, default=100)
    p.add_argument("--ldm-epochs", type=int, default=202)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--resume-ldm", default=None)
    p.add_argument("--device-resident", action="store_true",
                   help="keep the whole pack in HBM and gather batches on "
                        "device (datasets/device.py) instead of streaming "
                        "uint8 batches through the relay")
    p.add_argument("--results-dir", default=str(REPO / "docs" / "results"
                                                / "fullscale"))
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    import dataclasses
    import jax
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import (
        DevicePairLoader, DeviceResidentPairs, PackedBatchLoader,
        PackedPairDataset, PackedSpectrogramDataset, train_test_split,
    )
    from music_style_transfer_ldm_tpu.training import (
        AETrainer, LDMTrainer, checkpoint as ckpt_lib,
    )

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)

    prepare_dataset(workdir, args.seconds, args.pairs)

    cfg = default_config()
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=args.batch, ckpt_every_epochs=50,
        # Trainable style term (the reference's no_grad quirk keeps its
        # style loss flat — round-1 runs showed both modes; use the one
        # that actually converges for the flagship run).
        style_loss_stop_gradient=False)

    # ---- phase 1: autoencoder ------------------------------------------
    ae_dir = workdir / "runs" / "ae"
    t_ae = 0.0
    if not (ae_dir / "pretrained_final").exists():
        ds = PackedSpectrogramDataset(workdir / "train.spk")
        print(f"AE dataset: {len(ds)} images, native={ds.native}",
              flush=True)
        tr, te = train_test_split(len(ds), cfg.train.train_split,
                                  seed=cfg.train.seed)
        tl = PackedBatchLoader(ds, args.batch, indices=tr, shuffle=True,
                               seed=cfg.train.seed, dtype="uint8")
        vl = PackedBatchLoader(ds, args.batch, indices=te, shuffle=False,
                               dtype="uint8")
        ae = AETrainer(cfg)
        t0 = time.time()
        ae.train(tl, vl, num_epochs=args.ae_epochs, out_dir=ae_dir)
        t_ae = time.time() - t0
        print(f"AE phase: {args.ae_epochs} epochs in {t_ae:.0f}s", flush=True)

    # ---- phase 2: LDM ----------------------------------------------------
    ldm_dir = workdir / "runs" / "ldm"
    trainer = LDMTrainer(cfg)
    if args.device_resident:
        pair_ds = DeviceResidentPairs(workdir / "train.spk",
                                      workdir / "pairings.csv",
                                      mesh=trainer.mesh)
        print(f"pair dataset: {len(pair_ds)} pairs, device-resident "
              f"({pair_ds.images.nbytes / 1e6:.0f} MB in HBM)", flush=True)
        tr, _ = train_test_split(len(pair_ds), cfg.train.train_split,
                                 seed=cfg.train.seed)
        train_loader = DevicePairLoader(pair_ds, args.batch, indices=tr,
                                        shuffle=True, seed=cfg.train.seed)
    else:
        pair_ds = PackedPairDataset(workdir / "train.spk",
                                    workdir / "pairings.csv")
        print(f"pair dataset: {len(pair_ds)} pairs, "
              f"native={pair_ds.pack.native}", flush=True)
        tr, _ = train_test_split(len(pair_ds), cfg.train.train_split,
                                 seed=cfg.train.seed)
        train_loader = PackedBatchLoader(pair_ds, args.batch, indices=tr,
                                         shuffle=True, seed=cfg.train.seed,
                                         dtype="uint8")
    pre = ckpt_lib.load_autoencoder(ae_dir / "pretrained")
    t0 = time.time()
    state = trainer.train(train_loader, num_epochs=args.ldm_epochs,
                          pretrained_autoencoder=pre, out_dir=ldm_dir,
                          resume_from=args.resume_ldm)
    t_ldm = time.time() - t0
    steps_per_epoch = len(train_loader)
    print(f"LDM phase: {args.ldm_epochs} epochs x {steps_per_epoch} steps "
          f"in {t_ldm:.0f}s", flush=True)

    # ---- pipeline measurement -------------------------------------------
    meas = measure_pipeline(trainer, state, train_loader)
    meas.update({
        "pairs": len(pair_ds), "train_pairs": len(tr),
        "batch_size": args.batch,
        "steps_per_epoch": steps_per_epoch,
        "ldm_epochs": args.ldm_epochs,
        "ldm_wall_s": round(t_ldm, 1),
        "ae_wall_s": round(t_ae, 1),
        "epoch_s_sustained": round(t_ldm / max(args.ldm_epochs, 1), 2),
        "device": str(jax.devices()[0]),
    })
    print(json.dumps(meas, indent=2), flush=True)

    # ---- collect artifacts ----------------------------------------------
    results = Path(args.results_dir)
    results.mkdir(parents=True, exist_ok=True)
    (results / "pipeline_measurement.json").write_text(
        json.dumps(meas, indent=2) + "\n")
    for src, dst in [(ldm_dir / "metrics.csv", "ldm_metrics_fullscale.csv"),
                     (ae_dir / "metrics.csv", "ae_metrics_fullscale.csv")]:
        if src.exists():
            shutil.copy(src, results / dst)
    try:
        import csv as _csv
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with open(ldm_dir / "metrics.csv") as f:
            rows = list(_csv.DictReader(f))
        keys = ["total_loss", "compression_loss", "denoising_loss",
                "style_loss"]
        for logscale, name in [(False, "ldm_loss_fullscale.png"),
                               (True, "ldm_loss_fullscale_log.png")]:
            plt.figure(figsize=(10, 5))
            for k in keys:
                plt.plot([float(r[k]) for r in rows], label=k)
            if logscale:
                plt.yscale("log")
            plt.xlabel("Epoch")
            plt.ylabel("Loss")
            plt.grid(True)
            plt.legend()
            plt.savefig(results / name)
            plt.close()
    except Exception as e:  # noqa: BLE001 — plotting is best-effort
        print(f"plotting failed: {e}")
    print(f"artifacts -> {results}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

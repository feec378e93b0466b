"""Command-line interface.

Replaces the reference's argparse entry (`python models/train.py --model
{autoencoder,ldm}`, ref: models/train.py:318-329) and its script-style
workflows with proper subcommands:

  python -m music_style_transfer_ldm_tpu.cli download --csv urls.csv
  python -m music_style_transfer_ldm_tpu.cli build-dataset
  python -m music_style_transfer_ldm_tpu.cli generate-pairings
  python -m music_style_transfer_ldm_tpu.cli train --model autoencoder
  python -m music_style_transfer_ldm_tpu.cli train --model ldm
  python -m music_style_transfer_ldm_tpu.cli generate --style s.png
  python -m music_style_transfer_ldm_tpu.cli transfer --content c.wav --style s.png
  python -m music_style_transfer_ldm_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load_image_or_audio(path: str, ap, n_mels: int = 128) -> np.ndarray:
    """PNG spectrogram or audio file -> [1, 128, 128, 1] float image."""
    p = Path(path)
    if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp"):
        from music_style_transfer_ldm_tpu.datasets.folder import (
            load_image_unit,
        )
        return load_image_unit(p)[None]
    audio, _ = ap.load_audio(p)
    audio = ap.trim_silence(audio)
    return ap.clip_to_content_image(audio, n_mels=n_mels)[None]


def cmd_download(args) -> int:
    from music_style_transfer_ldm_tpu.data.downloader import AudioDownloader
    dl = AudioDownloader(output_dir=args.output_dir)
    if args.csv:
        dl.download_from_csv(args.csv)
    elif args.file:
        dl.download_from_file(args.file)
    elif args.url:
        dl.download_audio(args.url, instrument=args.instrument or "")
        dl.report_failures()
    else:
        print("one of --csv/--file/--url is required", file=sys.stderr)
        return 2
    return 0


def cmd_build_dataset(args) -> int:
    from music_style_transfer_ldm_tpu.data.build_dataset import (
        build_dataset_df, build_dataset_folder_structure,
    )
    if args.parquet:
        df = build_dataset_df(args.audio_dir, save_path=args.parquet)
        print(f"wrote {len(df)} rows to {args.parquet}")
    else:
        n = build_dataset_folder_structure(
            args.audio_dir, args.output_root, chunk_size_sec=args.chunk_sec,
            max_duration=args.max_duration, n_mels=args.n_mels)
        print(f"wrote {n} images under {args.output_root}")
    return 0


def cmd_generate_pairings(args) -> int:
    from music_style_transfer_ldm_tpu.datasets.folder import generate_pairings
    generate_pairings(args.root, args.output, num_pairs=args.num_pairs,
                      seed=args.seed)
    print(f"pairings saved to {args.output}")
    return 0


def _encode_kind(kind: str) -> np.ndarray:
    """Orbax/tensorstore can't store string leaves: kind as ASCII bytes."""
    return np.frombuffer(kind.encode(), dtype=np.uint8).copy()


def _decode_kind(arr) -> str:
    return bytes(np.asarray(arr, np.uint8).ravel()).decode()


def _load_feature_params(path, expected_kind: str):
    """Load a transplanted feature-params checkpoint (import-torch --vggish
    / --lpips output) for the trainer; None passes through (random trunk).
    """
    if not path:
        return None
    from music_style_transfer_ldm_tpu.training.checkpoint import (
        restore_pytree,
    )
    payload = restore_pytree(path)
    kind = _decode_kind(payload.get("kind"))
    if kind != expected_kind:
        raise SystemExit(
            f"feature checkpoint {path} holds {kind!r} weights but the "
            f"loss expects {expected_kind!r} (check --style-features vs "
            "--compression-features / train.compression_feature_extractor)")
    print(f"transplanted {kind} feature weights loaded from {path}",
          flush=True)
    return payload["params"]


def cmd_train(args) -> int:
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import (
        BatchLoader, SpectrogramDataset, SpectrogramPairDataset,
        train_test_split,
    )
    from music_style_transfer_ldm_tpu.training import AETrainer, LDMTrainer
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    import dataclasses
    cfg = default_config()
    if args.epochs:
        cfg.train = dataclasses.replace(cfg.train, num_epochs=args.epochs)
    if getattr(args, "style_dropout", 0.0):
        cfg.train = dataclasses.replace(cfg.train,
                                        style_dropout=args.style_dropout)
    if getattr(args, "lr", None):
        cfg.train = dataclasses.replace(cfg.train, learning_rate=args.lr)
    if getattr(args, "ema_decay", 0.0):
        cfg.train = dataclasses.replace(cfg.train, ema_decay=args.ema_decay)
    root = args.data_root or cfg.data.processed_dir

    if args.model == "autoencoder":
        ds = SpectrogramDataset(root)
        tr_idx, te_idx = train_test_split(len(ds), cfg.train.train_split,
                                          seed=cfg.train.seed)
        train_loader = BatchLoader(ds, cfg.train.batch_size, indices=tr_idx,
                                   shuffle=True, seed=cfg.train.seed)
        val_loader = BatchLoader(ds, cfg.train.batch_size, indices=te_idx,
                                 shuffle=False)
        trainer = AETrainer(cfg)
        trainer.train(train_loader, val_loader, out_dir=args.out_dir,
                      resume_from=args.resume_from)
    else:
        pair_file = args.pairing_file or cfg.data.pairing_file
        pair_ds = SpectrogramPairDataset(root, pair_file)
        loader = BatchLoader(pair_ds, cfg.train.batch_size, shuffle=True,
                             seed=cfg.train.seed)
        trainer = LDMTrainer(
            cfg,
            style_feature_params=_load_feature_params(
                getattr(args, "style_features", None), "vggish"),
            compression_feature_params=_load_feature_params(
                getattr(args, "compression_features", None),
                cfg.train.compression_feature_extractor))
        pre = None
        if args.pretrained_ae:
            pre = ckpt_lib.load_autoencoder(args.pretrained_ae)
        trainer.train(loader, pretrained_autoencoder=pre,
                      out_dir=args.out_dir, resume_from=args.resume_from)
    return 0


def cmd_distill(args) -> int:
    """Progressive distillation of the transfer sampler
    (training/distill.py; no reference counterpart — its samplers walk
    every step, ref: models/model.py:431-458)."""
    import dataclasses

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import (
        BatchLoader, SpectrogramPairDataset,
    )
    from music_style_transfer_ldm_tpu.models.ldm import load_ldm
    from music_style_transfer_ldm_tpu.training.distill import (
        ProgressiveDistiller,
    )

    cfg = default_config()
    if args.batch_size:
        cfg.train = dataclasses.replace(cfg.train,
                                        batch_size=args.batch_size)
    root = args.data_root or cfg.data.processed_dir
    pair_file = args.pairing_file or cfg.data.pairing_file
    pair_ds = SpectrogramPairDataset(root, pair_file)
    loader = BatchLoader(pair_ds, cfg.train.batch_size, shuffle=True,
                         seed=cfg.train.seed)

    _, variables = load_ldm(cfg, full_checkpoint=args.checkpoint)
    stages = [int(s) for s in args.stages.split(",") if s]
    dist = ProgressiveDistiller(cfg, t_max=args.t_max)
    _, info = dist.distill(variables, loader, stages=stages,
                           steps_per_stage=args.steps_per_stage,
                           lr=args.lr, out_dir=args.out_dir,
                           seed=cfg.train.seed, guidance=args.guidance,
                           inflight_every=args.inflight_every)
    final = info["steps"]
    # --steps must match the distillation range: the student only ever saw
    # the grid linspace(t_max-1, 0, N+1); sampling it with a different
    # noising depth (e.g. the transfer default --steps 100 after
    # --t-max 50) walks timesteps it was never trained on.
    print(f"distilled to {final} steps; transfer with "
          f"--steps {info['t_max']} --sample-steps {final + 1} "
          f"(grids: {info['stages']} -> {final})"
          f"; checkpoints under {args.out_dir}")
    return 0


def _restore_ldm(cfg, ckpt_path: str, use_ema: bool = True):
    from music_style_transfer_ldm_tpu.models.ldm import load_ldm
    return load_ldm(cfg, full_checkpoint=ckpt_path, use_ema=use_ema)


def _warn_distill_mismatch(args) -> None:
    """Warn when sampling a distilled student off its training grid.

    A student distilled with `distill --t-max T` to N steps only ever saw
    the grid linspace(T-1, 0, N+1); `transfer --steps != T` or
    `--sample-steps != N+1` walks timesteps it was never trained on and
    degrades silently (ADVICE r03).  Advisory only — intentional
    off-grid sampling stays possible.
    """
    if not getattr(args, "checkpoint", None):
        return
    from music_style_transfer_ldm_tpu.models.ldm import (
        checkpoint_distill_meta,
    )
    meta = checkpoint_distill_meta(args.checkpoint)
    if not meta:
        return
    want_steps = int(meta.get("t_max", args.steps))
    want_sample = int(meta.get("steps", 0)) + 1
    got_sample = (args.sample_steps if args.sample_steps is not None
                  else args.steps)
    if int(args.steps) != want_steps or int(got_sample) != want_sample:
        print(f"WARNING: checkpoint was distilled for --steps {want_steps} "
              f"--sample-steps {want_sample}, but got --steps {args.steps} "
              f"--sample-steps {got_sample}: the student never trained on "
              f"this grid and output quality will degrade silently",
              file=sys.stderr)


def _warn_generate_distill_mismatch(args, num_timesteps: int) -> None:
    """Generation-side twin of _warn_distill_mismatch.

    Generation walks linspace(T-1, 0, --steps) over the FULL schedule, so
    a distilled student is only on-grid when it was distilled with
    t_max == T (e.g. the guided-generation cascade,
    docs/results/guidance_gen/README.md) AND --steps == its trained
    steps + 1.  A transfer-distilled student (t_max < T) never saw the
    high-noise end of the generation grid at all.  Advisory only."""
    if not getattr(args, "checkpoint", None):
        return
    from music_style_transfer_ldm_tpu.models.ldm import (
        checkpoint_distill_meta,
    )
    meta = checkpoint_distill_meta(args.checkpoint)
    if not meta:
        return
    t_max = int(meta.get("t_max", num_timesteps))
    want = int(meta.get("steps", 0)) + 1
    if t_max != num_timesteps:
        print(f"WARNING: checkpoint was distilled for TRANSFER over "
              f"t_max={t_max} (< the full T={num_timesteps} schedule); "
              "generation from noise walks timesteps it never trained on "
              "and output quality will degrade silently",
              file=sys.stderr)
    elif int(args.steps) != want:
        print(f"WARNING: generation-distilled checkpoint expects "
              f"--steps {want} (its training grid), got {args.steps}: "
              "off-grid sampling degrades silently", file=sys.stderr)


def cmd_generate(args) -> int:
    """Style-conditioned generation from noise (ref: tests.py:782-876)."""
    import jax
    from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import style_ddim_sample

    cfg = default_config()
    _warn_generate_distill_mismatch(args, cfg.diffusion.num_timesteps)
    ap = AudioProcessor()
    model, variables = _restore_ldm(
        cfg, args.checkpoint, use_ema=not getattr(args, "raw_weights", False))
    style = _load_image_or_audio(args.style, ap)
    lat = cfg.model.image_size // 8
    z_shape = (1, lat, lat, cfg.model.latent_dim)
    if args.sampler in ("fused", "fused-dpm++"):
        if args.guidance != 1.0:
            raise SystemExit("--guidance needs the scan samplers "
                             "(ddim/dpm++); the fused trajectory kernel "
                             "runs the single conditional branch only")
        from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
            fused_style_sample,
        )
        decoded = fused_style_sample(
            model, variables, jax.random.PRNGKey(args.seed), z_shape, style,
            timesteps=args.steps, eta=args.eta,
            sampler="dpm++" if args.sampler == "fused-dpm++" else "ddim")
    else:
        decoded, _ = style_ddim_sample(
            model, variables, jax.random.PRNGKey(args.seed), z_shape, style,
            timesteps=args.steps, eta=args.eta, sampler=args.sampler,
            guidance=args.guidance)
    _save_outputs(np.asarray(decoded[0, :, :, 0]), args.output, ap)
    return 0


def _audio_to_chunk_images(path: str, ap, n_mels: int = 128,
                           overlap: float = 0.0):
    """Full clip -> ([n_chunks, 128, 128, 1] spectrogram images,
    [n_chunks, samples] waveform chunks) — 3 s chunks, zero-padded last;
    one jitted DSP call for the whole clip.  overlap in [0, 1) makes the
    chunks overlap by that fraction (crossfade-stitched on output)."""
    from music_style_transfer_ldm_tpu.data.build_dataset import chunk_audio
    audio, sr = ap.load_audio(path)
    audio = ap.trim_silence(audio)
    hop_s = 3.0 * (1.0 - overlap) if overlap else None
    chunks = chunk_audio(audio, sr, 3.0, None, hop_seconds=hop_s)
    imgs = np.asarray(ap.waveform_batch_to_unit_images(chunks, n_mels=n_mels))
    return imgs[:, :, :128, None].astype(np.float32), chunks


def cmd_transfer(args) -> int:
    """Content+style transfer — the product path (ref: tests.py:1043-1132).

    Content audio of any length is processed as one batch of 3 s chunks
    (the whole clip goes through the sampler in a single device program)
    and the reconstructed chunks are concatenated back into one WAV.
    """
    import jax
    from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import content_style_transfer

    cfg = default_config()
    ap = AudioProcessor()
    model, variables = _restore_ldm(
        cfg, args.checkpoint, use_ema=not getattr(args, "raw_weights", False))
    _warn_distill_mismatch(args)
    if not 0.0 <= args.overlap < 1.0:
        raise SystemExit(f"--overlap must be in [0, 1); got {args.overlap}")
    content_chunks = None
    if Path(args.content).suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp"):
        if args.overlap:
            raise SystemExit("--overlap needs audio content "
                             "(got a spectrogram image)")
        content = _load_image_or_audio(args.content, ap)
    else:
        content, content_chunks = _audio_to_chunk_images(
            args.content, ap, overlap=args.overlap)
    style = np.repeat(_load_image_or_audio(args.style, ap),
                      content.shape[0], axis=0)
    if args.sampler in ("fused", "fused-dpm++"):
        if args.guidance != 1.0:
            raise SystemExit("--guidance needs the scan samplers "
                             "(ddim/dpm++); the fused trajectory kernel "
                             "runs the single conditional branch only")
        # Multi-chunk clips run the BATCHED fused trajectory kernel in
        # groups of the per-chip fused bucket cap (the measured win
        # region; at most two
        # compiles: one full group + one remainder group).  Per-chunk keys
        # derived by fold_in: no collision with another seed's stream
        # (seed+i would alias seed'=seed+1's chunk 0), and identical
        # outputs regardless of how chunks group into batches (per-item
        # noising keys; batch elements compute independently).  Note the
        # scan path instead draws one batched q_sample from PRNGKey(seed),
        # so outputs differ across samplers for multi-chunk clips
        # (documented in the --sampler help).
        from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
            fused_content_style_transfer,
        )
        from music_style_transfer_ldm_tpu.utils.chips import (
            fused_bucket_max,
        )
        import jax.numpy as jnp
        bucket_cap = fused_bucket_max()
        root = jax.random.PRNGKey(args.seed)
        keys = jnp.stack([jax.random.fold_in(root, i)
                          for i in range(content.shape[0])])
        inner = "dpm++" if args.sampler == "fused-dpm++" else "ddim"
        parts = []
        for lo in range(0, content.shape[0], bucket_cap):
            hi = min(lo + bucket_cap, content.shape[0])
            parts.append(fused_content_style_transfer(
                model, variables, keys[lo:hi], content[lo:hi],
                style[lo:hi], num_timesteps=args.steps, eta=args.eta,
                steps=args.sample_steps, sampler=inner))
        decoded = jnp.concatenate(parts, axis=0)
    else:
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(args.seed),
            content, style, num_timesteps=args.steps, eta=args.eta,
            sampler=args.sampler, steps=args.sample_steps,
            guidance=args.guidance)
    if args.match_level:
        from music_style_transfer_ldm_tpu.models.ldm import match_moments
        import jax.numpy as jnp
        decoded = match_moments(jnp.asarray(decoded), jnp.asarray(style))
    else:
        # The raw decoder output carries the style's envelope shape at
        # ~4x compressed global level (models/ldm.py:match_moments doc) —
        # quiet mels invert to near-silent WAVs.  Reference parity keeps
        # raw output the default, but warn so a first-time user's
        # "silent output" has a one-flag answer.
        out_level = float(np.mean(np.asarray(decoded)))
        ref_level = float(np.mean(np.asarray(style)))
        if out_level < 0.5 * ref_level:
            print(f"note: output global level ({out_level:.3f}) is well "
                  f"below the style reference's ({ref_level:.3f}); the "
                  "inverted audio may be very quiet. Re-run with "
                  "--match-level to moment-match the output to the style.",
                  file=sys.stderr)
    init_phase = None
    if args.phase_init == "content":
        if content_chunks is None:
            raise SystemExit("--phase-init content needs audio content "
                             "(got a spectrogram image)")
        # Seed Griffin-Lim with the content chunks' own phases: the time
        # structure survives the transfer, so this converges much faster
        # than random phases (phase-reuse; see audio/griffinlim.py).
        # Host-side numpy STFT + real angles: the axon relay cannot move
        # complex64 in either direction (audio/stft.py stft_np).
        from music_style_transfer_ldm_tpu.audio.stft import stft_np
        spec = stft_np(content_chunks, n_fft=ap.n_fft,
                       hop_length=ap.hop_length)
        init_phase = np.angle(spec[:, :, :128]).astype(np.float32)
    hop_samples = (int(3 * (1.0 - args.overlap) * ap.target_sr)
                   if args.overlap else None)
    _save_outputs(np.asarray(decoded[:, :, :, 0]), args.output, ap,
                  init_phase=init_phase, hop_samples=hop_samples)
    return 0


def cmd_diagnose(args) -> int:
    """Model diagnostics (ref: models/tests.py:878,918 run-by-hand checks)."""
    import jax
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.evaluation import (
        detect_dead_style_encoder, parameter_table, style_embedding_stats,
    )
    from music_style_transfer_ldm_tpu.models.ldm import LDM

    cfg = default_config()
    model, variables = _restore_ldm(
        cfg, args.checkpoint, use_ema=not getattr(args, "raw_weights", False))
    table = parameter_table(variables["params"])
    print("parameter counts:")
    for k, v in table.items():
        print(f"  {k:<16} {v:>12,}")

    rng = np.random.RandomState(0)
    styles = rng.rand(8, cfg.model.image_size, cfg.model.image_size,
                      1).astype(np.float32)
    embs = model.apply(variables, styles, method=LDM.style_embed)
    stats = style_embedding_stats(embs)
    dead = detect_dead_style_encoder(embs)
    print("style embedding stats (std ~ 0 across distinct styles = dead):")
    for k in sorted(stats):
        flag = "  DEAD" if dead[k] else ""
        print(f"  {k}: std={stats[k]['std']:.5f} "
              f"zero_frac={stats[k]['zero_fraction']:.3f}{flag}")
    return 0


def _save_outputs(img01: np.ndarray, output: str, ap,
                  init_phase: np.ndarray | None = None,
                  hop_samples: int | None = None) -> None:
    """Write <output>.png (spectrogram) and <output>.wav (Griffin-Lim).

    img01 may be [H, W] (single chunk) or [N, H, W] (a chunked clip: chunks
    are phase-recovered as one batch and stitched into one WAV; the PNG
    tiles them horizontally).  init_phase optionally seeds Griffin-Lim
    (--phase-init content); hop_samples < chunk length crossfades the
    overlap (--overlap) instead of concatenating.
    """
    from PIL import Image
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    from music_style_transfer_ldm_tpu.audio.quantize import (
        unit_image_to_uint8,
    )

    out = Path(output)
    out.parent.mkdir(parents=True, exist_ok=True)
    sr = ap.target_sr
    batched = img01.ndim == 3
    u8 = np.asarray(unit_image_to_uint8(img01))
    png = np.concatenate(list(u8), axis=1) if batched else u8
    Image.fromarray(png, mode="L").save(out.with_suffix(".png"))
    audio = np.asarray(ap.grayscale_mel_spectrogram_image_to_audio(
        u8, length=3 * sr, init_phase=init_phase))
    if batched:
        from music_style_transfer_ldm_tpu.audio.processor import (
            crossfade_stitch,
        )
        audio = crossfade_stitch(
            audio, audio.shape[1] if hop_samples is None else hop_samples)
    write_wav(out.with_suffix(".wav"), audio, sr)
    print(f"wrote {out.with_suffix('.png')} and {out.with_suffix('.wav')}")


def _serve_engine_config(ecfg, args, path, name,
                         num_timesteps: int = 200):
    """Per-model EngineConfig: a progressively distilled student only ever
    trained on its own coarse grid (training/distill.py metadata), so
    serving adopts that grid unless the user pinned --sample-steps — in
    which case an off-grid choice warns exactly like `transfer` does."""
    import dataclasses

    from music_style_transfer_ldm_tpu.models.ldm import (
        checkpoint_distill_meta,
    )
    meta = checkpoint_distill_meta(path)
    if not meta:
        return ecfg
    want_steps = int(meta.get("t_max", args.steps))
    want_sample = int(meta.get("steps", 0)) + 1
    # A FULL-schedule (generation) cascade's grid also applies to the
    # /v1/generate route; adopt it there unless the user pinned one.
    gen_kw = {}
    if (getattr(args, "generate_steps", None) is None
            and want_steps == num_timesteps):  # full-schedule cascade
        gen_kw = {"generate_steps": want_sample}
    if args.sample_steps is None:
        print(f"{name}: distilled checkpoint (stages {meta.get('stages')}):"
              f" serving on its trained grid steps={want_steps} "
              f"sample_steps={want_sample}"
              + (f" (generate route: {want_sample})" if gen_kw else ""),
              flush=True)
        return dataclasses.replace(ecfg, steps=want_steps,
                                   sample_steps=want_sample, **gen_kw)
    if int(args.steps) != want_steps or int(args.sample_steps) != want_sample:
        print(f"WARNING: {name}: checkpoint was distilled for --steps "
              f"{want_steps} --sample-steps {want_sample}, but serving with "
              f"--steps {args.steps} --sample-steps {args.sample_steps}: "
              "the student never trained on this grid and output quality "
              "will degrade silently", file=sys.stderr)
    return ecfg


def cmd_serve(args) -> int:
    """Run the HTTP inference server over a checkpoint."""
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.serving import (
        EngineConfig, InferenceEngine, serve,
    )
    cfg = default_config()
    ecfg = EngineConfig(steps=args.steps, sampler=args.sampler,
                        sample_steps=args.sample_steps,
                        guidance=args.guidance,
                        generate_steps=args.generate_steps,
                        generate_guidance=args.generate_guidance,
                        batch_buckets=tuple(args.buckets),
                        max_wait_ms=args.max_wait_ms,
                        autoscale=args.autoscale)
    mesh = None
    if args.mesh_dp > 1:
        from music_style_transfer_ldm_tpu.parallel import make_mesh
        mesh = make_mesh((args.mesh_dp, 1))
    # --checkpoint accepts a bare path (single model) or repeated
    # name=path entries (multi-model routing at /v1/models/<name>/transfer;
    # the first is the default model).
    engines = {}
    for spec in args.checkpoint:
        name, _, path = spec.rpartition("=")
        name = name or ("default" if not engines else
                        f"model{len(engines)}")
        model, variables = _restore_ldm(
            cfg, path, use_ema=not getattr(args, "raw_weights", False))
        m_ecfg = _serve_engine_config(
            ecfg, args, path, name, cfg.diffusion.num_timesteps)
        engines[name] = InferenceEngine(model, variables, m_ecfg, mesh=mesh)
    print(f"warming {len(args.buckets)} batch buckets x "
          f"{len(engines)} model(s)...", flush=True)
    for eng in engines.values():
        eng.warmup()
    engine = engines if len(engines) > 1 else next(iter(engines.values()))
    print(f"serving on http://{args.host}:{args.port}"
          + (" (bearer auth)" if args.auth_token else ""), flush=True)
    serve(engine, host=args.host, port=args.port, block=True,
          auth_token=args.auth_token, request_timeout_s=args.timeout,
          max_queue=args.max_queue)
    return 0


def cmd_import_torch(args) -> int:
    """Convert a trained reference PyTorch checkpoint into an orbax
    checkpoint usable by every command here (interop/torch_weights.py).

    --vggish / --lpips transplant PRETRAINED PERCEPTUAL weights (the
    reference's torch.hub VGGish, ref: models/loss.py:56-62, and its pip
    lpips AlexNet, ref: models/loss.py:10) into feature-params checkpoints
    that `train --style-features / --compression-features` consume — the
    one-command path for the day real AudioSet/LPIPS weights reach this
    air-gapped machine (rehearsed end-to-end in tests/test_transplant.py).
    """
    from music_style_transfer_ldm_tpu.interop import (
        convert_autoencoder_state_dicts, convert_ldm_state_dict,
    )
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    def load_sd(path):
        import torch
        # raw tensors are fine: the converters detach/convert themselves
        sd = torch.load(path, map_location="cpu")
        # torch.hub modules often save {'state_dict': ...} wrappers.
        return sd.get("state_dict", sd) if isinstance(sd, dict) else sd

    if args.vggish:
        from music_style_transfer_ldm_tpu.losses.vggish import (
            convert_torchvggish_state_dict,
        )
        payload = {"kind": _encode_kind("vggish"),
                   "params": convert_torchvggish_state_dict(
                       load_sd(args.vggish))}
    elif args.lpips:
        from music_style_transfer_ldm_tpu.losses.lpips import (
            convert_torch_lpips_state_dict,
        )
        payload = {"kind": _encode_kind("lpips"),
                   "params": convert_torch_lpips_state_dict(
                       load_sd(args.lpips))}
    elif args.ldm:
        payload = convert_ldm_state_dict(load_sd(args.ldm))
    elif args.encoder and args.decoder:
        payload = convert_autoencoder_state_dicts(load_sd(args.encoder),
                                                  load_sd(args.decoder))
    else:
        print("provide --ldm, --vggish, --lpips, or --encoder and "
              "--decoder", file=sys.stderr)
        return 2
    # Migrated torch weights target the exact-torch (v2) deconv geometry.
    payload["format_version"] = np.asarray(ckpt_lib.FORMAT_VERSION)
    ckpt_lib.save_pytree(args.out, payload)
    print(f"converted checkpoint written to {args.out}")
    return 0


def cmd_bench(_args) -> int:
    from music_style_transfer_ldm_tpu.benchmarks import main as bench_main
    bench_main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="music_style_transfer_ldm_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("download", help="download audio via yt-dlp")
    d.add_argument("--csv")
    d.add_argument("--file")
    d.add_argument("--url")
    d.add_argument("--instrument")
    d.add_argument("--output-dir", default="downloads")
    d.set_defaults(fn=cmd_download)

    b = sub.add_parser("build-dataset", help="audio -> spectrogram images")
    b.add_argument("--audio-dir", default="downloads")
    b.add_argument("--output-root", default="processed_images")
    b.add_argument("--parquet", help="write parquet instead of PNG tree")
    b.add_argument("--chunk-sec", type=float, default=3.0)
    b.add_argument("--max-duration", type=float, default=1800.0)
    b.add_argument("--n-mels", type=int, default=128)
    b.set_defaults(fn=cmd_build_dataset)

    g = sub.add_parser("generate-pairings", help="deterministic pair CSV")
    g.add_argument("--root", default="processed_images")
    g.add_argument("--output", default="spectrogram_pair_dataset_pairings.csv")
    g.add_argument("--num-pairs", type=int, default=15000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_generate_pairings)

    t = sub.add_parser("train", help="train autoencoder or ldm")
    t.add_argument("--model", required=True, choices=["autoencoder", "ldm"])
    t.add_argument("--data-root")
    t.add_argument("--pairing-file")
    t.add_argument("--pretrained-ae",
                   help="autoencoder checkpoint to load & freeze")
    t.add_argument("--epochs", type=int)
    t.add_argument("--lr", type=float, default=None,
                   help="override the initial learning rate (e.g. resume a "
                        "finetune at the converged run's decayed LR "
                        "instead of the config default)")
    t.add_argument("--style-dropout", type=float, default=0.0,
                   help="LDM only: per-sample probability of zeroing the "
                        "style embedding (classifier-free-guidance "
                        "training; enables transfer --guidance)")
    t.add_argument("--ema-decay", type=float, default=0.0,
                   help="LDM only: track an exponential moving average of "
                        "the weights (0.999 typical; 0 = off). Checkpoints "
                        "then carry ema_params, which every inference "
                        "surface prefers (see --raw-weights)")
    t.add_argument("--style-features",
                   help="LDM only: transplanted VGGish feature-params "
                        "checkpoint (import-torch --vggish) for the style "
                        "loss; default = fixed-seed random trunk")
    t.add_argument("--compression-features",
                   help="LDM only: transplanted LPIPS feature-params "
                        "checkpoint (import-torch --lpips) for the "
                        "compression perceptual term")
    t.add_argument("--out-dir", default="runs/train")
    t.add_argument("--resume-from",
                   help="full train-state checkpoint to resume from")
    t.set_defaults(fn=cmd_train)

    dl = sub.add_parser(
        "distill", help="progressive sampler distillation: halve the "
                        "transfer grid stage by stage (beyond reference)")
    dl.add_argument("--checkpoint", required=True,
                    help="converged full-LDM (or train-state) checkpoint")
    dl.add_argument("--data-root")
    dl.add_argument("--pairing-file")
    dl.add_argument("--out-dir", default="runs/distill")
    dl.add_argument("--stages", default="96,48,24,12,6",
                    help="comma-separated teacher step counts; each entry "
                         "distills a student with the NEXT entry's step "
                         "count (integer factor >= 2); the final student "
                         "= last//2, or 1 when the last entry is odd "
                         "(e.g. 48,24,12,6,3 ends at one denoiser eval)")
    dl.add_argument("--steps-per-stage", type=int, default=400)
    dl.add_argument("--inflight-every", type=int, default=200,
                    help="checkpoint the live stage every N steps and "
                         "resume an interrupted stage from it (0 = off)")
    dl.add_argument("--lr", type=float, default=1e-4)
    dl.add_argument("--batch-size", type=int)
    dl.add_argument("--t-max", type=int, default=100,
                    help="transfer noise level the grids cover (matches "
                         "`transfer --steps`)")
    dl.add_argument("--guidance", type=float, default=1.0,
                    help="distill a classifier-free-GUIDED teacher at this "
                         "fixed scale (first stage only; needs a "
                         "style_dropout-trained checkpoint) — the students "
                         "bake the amplified style in and sample unguided")
    dl.set_defaults(fn=cmd_distill)

    dg = sub.add_parser("diagnose", help="parameter table + dead-style-"
                                         "encoder probe on a checkpoint")
    dg.add_argument("--checkpoint", required=True)
    dg.add_argument("--raw-weights", action="store_true",
                    help="diagnose the raw trained weights instead of the "
                         "EMA average")
    dg.set_defaults(fn=cmd_diagnose)

    gen = sub.add_parser("generate", help="style-conditioned generation")
    gen.add_argument("--checkpoint", required=True)
    gen.add_argument("--style", required=True)
    gen.add_argument("--steps", type=int, default=100)
    gen.add_argument("--eta", type=float, default=0.0)
    gen.add_argument("--sampler",
                     choices=["ddim", "dpm++", "fused", "fused-dpm++"],
                     default="ddim")
    gen.add_argument("--seed", type=int, default=0)
    gen.add_argument("--guidance", type=float, default=1.0,
                     help="classifier-free style-guidance scale (0 = "
                          "unconditional, 1 = plain conditional; needs a "
                          "checkpoint trained with style_dropout > 0). "
                          "GENERATION's measured operating point is "
                          "g~14-16 — far past transfer's g~1.5 knee; "
                          "below-ceiling FAD for all classes at 16 "
                          "(docs/results/guidance_gen/README.md)")
    gen.add_argument("--raw-weights", action="store_true",
                     help="sample from the raw (non-EMA) weights even when "
                          "the checkpoint carries ema_params")
    gen.add_argument("--output", default="outputs/generated")
    gen.set_defaults(fn=cmd_generate)

    tr = sub.add_parser("transfer", help="content+style transfer")
    tr.add_argument("--checkpoint", required=True)
    tr.add_argument("--content", required=True)
    tr.add_argument("--style", required=True)
    tr.add_argument("--steps", type=int, default=100)
    tr.add_argument("--eta", type=float, default=0.0)
    tr.add_argument("--sampler",
                    choices=["ddim", "dpm++", "fused", "fused-dpm++"],
                    default="ddim",
                    help="'fused*' run the Pallas trajectory kernel "
                         "(fused-dpm++ = second-order update, use with "
                         "--sample-steps); fused samplers draw per-chunk "
                         "noise keys so multi-chunk outputs differ from "
                         "the batched scan path at the same seed")
    tr.add_argument("--sample-steps", type=int, default=None,
                    help="coarse sampler grid (< --steps noising depth); "
                         "pairs with --sampler dpm++/fused-dpm++ for ~2x "
                         "fewer denoiser evaluations")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--guidance", type=float, default=1.0,
                    help="classifier-free style-strength knob (0 = ignore "
                         "style, 1 = plain conditional, > 1 = amplified "
                         "style; measured useful range [0, 1.5] — above "
                         "that every independent metric degrades, see "
                         "docs/results/guidance/README.md; needs a "
                         "checkpoint trained with style_dropout > 0; "
                         "scan samplers only)")
    tr.add_argument("--overlap", type=float, default=0.0,
                    help="fraction in [0, 1): process overlapping 3 s "
                         "chunks and crossfade the seams (removes the "
                         "phase discontinuities of disjoint chunks); "
                         "0 = reference-parity disjoint chunks")
    tr.add_argument("--phase-init", choices=["random", "content"],
                    default="random",
                    help="Griffin-Lim phase seed: 'content' reuses the "
                         "content audio's own phases (faster convergence, "
                         "cleaner transients); 'random' is reference "
                         "parity")
    tr.add_argument("--match-level", action="store_true",
                    help="affine-match each output's global level/contrast "
                         "to its style image (corrects the diffusion "
                         "decoder's compressed dynamic range; see "
                         "models.ldm.match_moments)")
    tr.add_argument("--raw-weights", action="store_true",
                    help="sample from the raw (non-EMA) weights even when "
                         "the checkpoint carries ema_params")
    tr.add_argument("--output", default="outputs/transferred")
    tr.set_defaults(fn=cmd_transfer)

    it = sub.add_parser("import-torch",
                        help="convert reference .pth checkpoints")
    it.add_argument("--ldm", help="full ldm_<epoch>.pth state dict")
    it.add_argument("--encoder", help="encoder.pth")
    it.add_argument("--decoder", help="decoder.pth")
    it.add_argument("--vggish",
                    help="torchvggish .pth -> style-feature params "
                         "(consumed by train --style-features)")
    it.add_argument("--lpips",
                    help="lpips(net='alex') .pth -> compression-feature "
                         "params (train --compression-features)")
    it.add_argument("--out", required=True)
    it.set_defaults(fn=cmd_import_torch)

    sv = sub.add_parser("serve", help="HTTP inference server (microbatched)")
    sv.add_argument("--checkpoint", required=True, action="append",
                    help="checkpoint path, or name=path (repeat for "
                         "multi-model routing; first entry is the default)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8787)
    sv.add_argument("--steps", type=int, default=50)
    sv.add_argument("--sampler",
                    choices=["ddim", "dpm++", "fused", "fused-dpm++"],
                    default="ddim",
                    help="'fused*' run the Pallas trajectory kernel on the "
                         "batch-1 bucket (fused-dpm++ = second-order "
                         "update)")
    sv.add_argument("--sample-steps", type=int, default=None,
                    help="coarse sampler grid (< --steps noising depth)")
    sv.add_argument("--guidance", type=float, default=1.0,
                    help="classifier-free style-guidance scale (scan "
                         "samplers only; needs style_dropout-trained "
                         "weights)")
    sv.add_argument("--generate-steps", type=int, default=None,
                    help="step grid for the /v1/generate route (default: "
                         "--steps; a generation-distilled student wants "
                         "its trained grid, e.g. 7)")
    sv.add_argument("--generate-guidance", type=float, default=1.0,
                    help="guidance for /v1/generate (measured generation "
                         "knee ~14-16 on CFG-trained weights; "
                         "docs/results/guidance_gen/)")
    sv.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8])
    sv.add_argument("--mesh-dp", type=int, default=1,
                    help="shard every serving bucket over this many "
                         "devices (data parallel; buckets round up to "
                         "multiples of it)")
    sv.add_argument("--max-wait-ms", type=float, default=5.0)
    sv.add_argument("--raw-weights", action="store_true",
                    help="serve the raw (non-EMA) weights even when a "
                         "checkpoint carries ema_params")
    sv.add_argument("--auth-token", default=None,
                    help="require 'Authorization: Bearer <token>'")
    sv.add_argument("--timeout", type=float, default=120.0,
                    help="per-request engine wait bound (504 past it)")
    sv.add_argument("--max-queue", type=int, default=256,
                    help="shed load with 429 when this many requests queue")
    sv.add_argument("--autoscale", action="store_true",
                    help="compile larger batch buckets when demand "
                         "saturates the current largest")
    sv.set_defaults(fn=cmd_serve)

    be = sub.add_parser("bench", help="run the headline benchmark")
    be.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

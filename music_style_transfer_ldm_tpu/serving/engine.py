"""Device-resident inference engine with request microbatching.

Design (no reference counterpart — the reference is a training repo with
script-style inference, models/tests.py):

* the LDM variables live on device once; the style-transfer program is
  pre-compiled for a fixed ladder of batch buckets (1, 2, 4, 8, ...) so no
  request ever triggers a compile;
* incoming requests enqueue; a dispatcher thread drains the queue into the
  largest fitting bucket (padding with repeats) after at most
  ``max_wait_ms`` — classic microbatching: single-request latency stays
  low while concurrent load rides the batch dimension, which is where TPU
  throughput lives;
* audio decode (WAV -> chunks) and Griffin-Lim inversion run inside the
  same device program as the sampler.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Largest bucket routed to the fused trajectory kernel on the v5e (the
# chip the r03 crossover sweep ran on — fused wins 2.3x at b=1..2, 1.6x
# at b=4, loses 0.94x at b=8 where XLA's batched convs have amortized
# their overhead). Kept for reference/back-compat; routing now derives
# the per-chip value via utils.chips.fused_bucket_max() (config override:
# EngineConfig.fused_bucket_max / MSTLDM_FUSED_BUCKET_MAX).
FUSED_BUCKET_MAX = 4


@dataclasses.dataclass
class EngineConfig:
    steps: int = 50
    eta: float = 0.0
    # 'ddim' (reference parity), 'dpm++' (DPM-Solver++(2M); with
    # sample_steps < steps it walks a coarse grid — same ODE accuracy with
    # ~half the denoiser evaluations, diffusion/dpm.py), or 'fused' (the
    # whole-trajectory Pallas kernel on the buckets <= FUSED_BUCKET_MAX,
    # 1.6-2.3x device
    # latency; bigger buckets fall back to the batched ddim scan, same
    # per-seed noise stream, results equal to bf16 tolerance).
    sampler: str = "ddim"
    sample_steps: Optional[int] = None
    # Classifier-free style-guidance scale (models/ldm.py:_denoise_fn);
    # 1.0 = plain conditional.  Needs a checkpoint trained with
    # style_dropout > 0 and a scan sampler (the fused kernel runs the
    # conditional branch only — rejected at construction).
    guidance: float = 1.0
    # Largest bucket routed to the fused trajectory kernel. None = derive
    # from the running chip (utils.chips.fused_bucket_max: measured v5e
    # crossover, peak-scaled heuristic elsewhere); set explicitly once a
    # crossover sweep has run on the target chip.
    fused_bucket_max: Optional[int] = None
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8)
    max_wait_ms: float = 5.0
    image_size: int = 128
    # Affine-match each output's global level/contrast to its style image
    # (models.ldm.match_moments) — corrects the diffusion decoder's
    # compressed dynamic range; off by default for reference parity.
    match_level: bool = False
    griffin_lim_iters: int = 32
    nnls_iters: int = 64
    invert_audio: bool = True
    # Bucket autoscaling: when `autoscale_after` consecutive dispatches
    # saturate the largest warm bucket while requests still queue, a 2x
    # bucket is compiled on a side thread (traffic keeps flowing on the
    # existing buckets) and adopted once warm, up to max_bucket.
    autoscale: bool = False
    autoscale_after: int = 4
    max_bucket: int = 128
    # Generation-from-noise route (POST /v1/generate): its own step grid
    # and guidance, independent of the transfer path's.  generate_steps
    # None = reuse `steps`.  For a generation-distilled student use its
    # trained grid (e.g. 7); for a stock/CFG checkpoint the measured
    # generation knee is guidance ~14-16 (docs/results/guidance_gen/).
    generate_steps: Optional[int] = None
    generate_guidance: float = 1.0


class InferenceEngine:
    """Warm engine over a trained LDM checkpoint.

    mesh: optional jax.sharding.Mesh — serving then scales with chip count:
    variables are replicated across the mesh, every bucket's batch is
    dp-sharded over the 'data' axis, and XLA partitions the whole transfer
    program (sampler + Griffin-Lim) across the devices.  Buckets are
    rounded up to multiples of the data-axis size so every request batch
    shards evenly (the engine's pad-and-crop path already guarantees pad
    rows cannot affect real rows).  The fused single-chip kernel is
    bypassed under a mesh (it is a one-core latency optimization).
    """

    def __init__(self, model, variables, config: Optional[EngineConfig] = None,
                 audio_processor=None, mesh=None):
        from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor
        self.model = model
        self.mesh = mesh
        self.config = config or EngineConfig()
        if (self.config.guidance != 1.0
                and self.config.sampler in ("fused", "fused-dpm++")):
            raise ValueError(
                "guidance != 1 needs a scan sampler (ddim/dpm++); the "
                "fused trajectory kernel runs the conditional branch only")
        if mesh is not None:
            from music_style_transfer_ldm_tpu.parallel.mesh import (
                replicated_sharding,
            )
            n_data = mesh.shape["data"]
            variables = jax.device_put(variables,
                                       replicated_sharding(mesh))
            self.config = dataclasses.replace(
                self.config,
                batch_buckets=tuple(sorted({
                    -(-b // n_data) * n_data
                    for b in self.config.batch_buckets})))
        from music_style_transfer_ldm_tpu.utils.chips import (
            fused_bucket_max,
        )
        self.fused_bucket_max = (self.config.fused_bucket_max
                                 if self.config.fused_bucket_max is not None
                                 else fused_bucket_max())
        self.variables = variables
        self.ap = audio_processor or AudioProcessor()
        self._queue: queue.Queue = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "padded_slots": 0,
                       "autoscaled_buckets": 0}
        self._stop = threading.Event()
        self._scale_lock = threading.Lock()
        self._warming: set = set()
        self._saturated = 0
        # One jitted program; jax specializes per batch shape, so the bucket
        # ladder only decides what to pad to (and what warmup pre-compiles).
        self._transfer_fn = self._build_transfer()
        # Generation program: built lazily on first use (optional route;
        # costs a compile only when someone actually generates).
        self._generate_fn = None
        self._gen_lock = threading.Lock()
        self._warm_buckets: set = set()
        self._thread: Optional[threading.Thread] = None

    # ---------------- compiled programs ------------------------------------

    def _build_transfer(self):
        from music_style_transfer_ldm_tpu.models.ldm import (
            content_style_transfer,
        )
        cfg = self.config

        def fn(content, style, keys):
            # keys: per-item PRNG keys [B, 2] — each request's result is
            # deterministic in its own seed regardless of how requests were
            # coalesced into batches.
            fused = cfg.sampler in ("fused", "fused-dpm++")
            # 'fused-dpm++' keeps the second-order update on BOTH paths:
            # the kernel on the fused buckets and the scan fallback on
            # bigger buckets — no silent accuracy downgrade when a request
            # lands in a batch (was ADVICE r02: fused + sample_steps ran
            # first-order DDIM on the coarse grid).
            inner = "dpm++" if cfg.sampler == "fused-dpm++" else (
                "ddim" if fused else cfg.sampler)
            if (fused and content.shape[0] <= self.fused_bucket_max
                    and self.mesh is None):
                # Batched fused Pallas trajectory kernel on the small
                # buckets (2.3x device win at b=1, 1.6x at b=4; the scan
                # sampler overtakes it near b=8 — measured r03, see the
                # kernel module docstring); bigger buckets ride the
                # batched scan sampler.  The partial-noising stream is the
                # per-item one, so the only cross-bucket difference for a
                # given seed is the bf16 trajectory tolerance (~3e-4).
                from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler \
                    import fused_content_style_transfer
                decoded = fused_content_style_transfer(
                    self.model, self.variables, keys, content, style,
                    num_timesteps=cfg.steps, eta=cfg.eta,
                    steps=cfg.sample_steps, sampler=inner)
            else:
                sampler = inner
                decoded, _, _ = content_style_transfer(
                    self.model, self.variables, keys, content, style,
                    num_timesteps=cfg.steps, eta=cfg.eta, sampler=sampler,
                    steps=cfg.sample_steps, guidance=cfg.guidance)
            if cfg.match_level:
                from music_style_transfer_ldm_tpu.models.ldm import (
                    match_moments,
                )
                decoded = match_moments(decoded, style)
            return self._finish_outputs(decoded)

        return jax.jit(fn)

    def _finish_outputs(self, decoded):
        """Shared tail of every inference program: package the decoded
        [B, S, S, 1] images and (optionally) invert them to audio on
        device (NNLS + Griffin-Lim) — used by both the transfer and the
        generation programs."""
        cfg = self.config
        out = {"image": decoded}
        if cfg.invert_audio:
            from music_style_transfer_ldm_tpu.audio.griffinlim import (
                mel_to_audio,
            )
            from music_style_transfer_ldm_tpu.audio.mel import db_to_power
            from music_style_transfer_ldm_tpu.audio.quantize import (
                unit_image_to_db,
            )
            db = unit_image_to_db(decoded[:, :, :, 0])
            sr = self.ap.target_sr
            out["audio"] = mel_to_audio(
                db_to_power(db), sr=sr, n_fft=self.ap.n_fft,
                hop_length=self.ap.hop_length,
                n_iter=cfg.griffin_lim_iters,
                nnls_iters=cfg.nnls_iters,
                length=int(3 * sr))
        return out

    def _build_generate(self):
        from music_style_transfer_ldm_tpu.models.ldm import (
            match_moments, style_ddim_sample,
        )
        cfg = self.config
        sampler = ("ddim" if cfg.sampler in ("fused", "fused-dpm++")
                   else cfg.sampler)
        steps = (cfg.generate_steps if cfg.generate_steps is not None
                 else cfg.steps)

        def fn(style, key):
            lat = cfg.image_size // 8
            z_shape = (style.shape[0], lat, lat, self.model.latent_dim)
            decoded, _ = style_ddim_sample(
                self.model, self.variables, key, z_shape, style,
                timesteps=steps, eta=cfg.eta, sampler=sampler,
                guidance=cfg.generate_guidance)
            if cfg.match_level:
                decoded = match_moments(decoded, style)
            return self._finish_outputs(decoded)

        return jax.jit(fn)

    def _place(self, *arrays):
        """dp-shard bucket-shaped arrays over the mesh (no-op without)."""
        if self.mesh is None:
            return arrays
        from music_style_transfer_ldm_tpu.parallel.sharding import (
            shard_batch,
        )
        return tuple(shard_batch(a, self.mesh, pad=False) for a in arrays)

    def warmup(self) -> None:
        """Pre-compile every bucket (call before taking traffic)."""
        S = self.config.image_size
        for b in self.config.batch_buckets:
            x = jnp.zeros((b, S, S, 1), jnp.float32)
            keys = jax.vmap(jax.random.PRNGKey)(jnp.zeros((b,), jnp.int32))
            out = self._transfer_fn(*self._place(x, x, keys))
            jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
            # Rebind (never mutate): concurrent readers iterate snapshots.
            self._warm_buckets = self._warm_buckets | {b}

    # ---------------- synchronous API ---------------------------------------

    def transfer_batch(self, content: np.ndarray, style: np.ndarray,
                       seeds=0) -> dict:
        """[B, 128, 128, 1] content+style -> {'image': ..., 'audio': ...}.

        seeds: scalar applied to all items, or one seed per item.  Batches
        larger than the biggest compiled bucket are split and the results
        concatenated.
        """
        if not self._warm_buckets:
            self.warmup()
        warm = self._warm_buckets  # snapshot: autoscale rebinds, never mutates
        b = content.shape[0]
        seeds = np.broadcast_to(np.asarray(seeds, np.int64), (b,))
        max_bucket = max(warm)
        if b > max_bucket:
            parts = [self.transfer_batch(content[s:s + max_bucket],
                                         style[s:s + max_bucket],
                                         seeds[s:s + max_bucket])
                     for s in range(0, b, max_bucket)]
            return {k: np.concatenate([p[k] for p in parts])
                    for k in parts[0]}
        bucket = min(k for k in warm if k >= b)
        pad = bucket - b
        # Pad rows cannot affect real rows' outputs: the transfer path runs
        # eval-mode (per-sample BN running stats, per-sample attention/convs,
        # per-item PRNG keys), so there is no cross-sample coupling at
        # inference; outputs are cropped back to the first b rows below.
        self._stats["padded_slots"] += pad
        if pad:
            content = np.concatenate(
                [content, np.repeat(content[-1:], pad, axis=0)])
            style = np.concatenate(
                [style, np.repeat(style[-1:], pad, axis=0)])
            seeds = np.concatenate([seeds, np.repeat(seeds[-1:], pad)])
        # Full-width deterministic keys: 64-bit seeds are split into two
        # 31-bit halves (jnp.asarray would silently truncate int64 with x64
        # disabled, aliasing seeds >= 2**31).
        u = seeds.astype(np.uint64)
        lo = jnp.asarray((u & 0x7FFFFFFF).astype(np.int32))
        hi = jnp.asarray(((u >> 31) & 0x7FFFFFFF).astype(np.int32))
        keys = jax.vmap(
            lambda l, h: jax.random.fold_in(jax.random.PRNGKey(l), h))(lo, hi)
        out = self._transfer_fn(
            *self._place(jnp.asarray(content), jnp.asarray(style), keys))
        self._stats["batches"] += 1
        return {k: np.asarray(v)[:b] for k, v in out.items()}

    def generate(self, style: np.ndarray, seed: int = 0) -> dict:
        """[B, S, S, 1] style images -> style-conditioned GENERATION from
        noise: {'image': [B, S, S, 1], 'audio': [B, T]?}.

        Synchronous and serialized behind a lock (no microbatching):
        generation is expected to be sparse next to transfer traffic, and
        its program compiles lazily on first call.  Deterministic in
        (seed, batch shape)."""
        u = np.uint64(np.int64(seed))
        lo = jnp.int32(int(u & np.uint64(0x7FFFFFFF)))
        hi = jnp.int32(int((u >> np.uint64(31)) & np.uint64(0x7FFFFFFF)))
        key = jax.random.fold_in(jax.random.PRNGKey(lo), hi)
        with self._gen_lock:
            if self._generate_fn is None:
                self._generate_fn = self._build_generate()
            (placed,) = self._place(jnp.asarray(style, jnp.float32))
            out = self._generate_fn(placed, key)
        return {k: np.asarray(v) for k, v in out.items()}

    # ---------------- async microbatching API --------------------------------

    def start(self) -> None:
        if self._thread is None:
            if not self._warm_buckets:
                self.warmup()
            self._stop.clear()
            self._thread = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def submit(self, content: np.ndarray, style: np.ndarray,
               seed: int = 0) -> "queue.Queue":
        """Enqueue one request ([128,128,1] images); returns a queue that
        will receive the {'image', 'audio'} result dict."""
        done: queue.Queue = queue.Queue(maxsize=1)
        self._queue.put((content, style, seed, done))
        self._stats["requests"] += 1
        return done

    def _maybe_autoscale(self, batch_len: int, max_b: int) -> None:
        """Warm a 2x bucket on a side thread when demand keeps saturating
        the largest warm bucket (traffic continues on existing buckets)."""
        if not self.config.autoscale:
            return
        if batch_len >= max_b and self.pending() > 0:
            self._saturated += 1
        else:
            self._saturated = 0
        new_b = max_b * 2
        if (self._saturated < self.config.autoscale_after
                or new_b > self.config.max_bucket):
            return
        with self._scale_lock:
            if new_b in self._warming or new_b in self._warm_buckets:
                return
            self._warming.add(new_b)
        self._saturated = 0

        def work():
            S = self.config.image_size
            x = jnp.zeros((new_b, S, S, 1), jnp.float32)
            keys = jax.vmap(jax.random.PRNGKey)(
                jnp.zeros((new_b,), jnp.int32))
            out = self._transfer_fn(x, x, keys)
            jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
            with self._scale_lock:
                # Rebind a NEW set instead of mutating in place: readers on
                # the dispatch thread run max()/min() over _warm_buckets
                # unlocked, and mutating a set mid-iteration raises
                # RuntimeError there (which would kill the dispatcher).
                self._warm_buckets = self._warm_buckets | {new_b}
                self._warming.discard(new_b)
                self._stats["autoscaled_buckets"] += 1

        threading.Thread(target=work, daemon=True).start()

    def _dispatch_loop(self) -> None:
        wait_s = self.config.max_wait_ms / 1000.0
        while not self._stop.is_set():
            max_b = max(self._warm_buckets)  # grows under autoscaling
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + wait_s
            while len(batch) < max_b:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._maybe_autoscale(len(batch), max_b)
            try:
                content = np.stack([r[0] for r in batch])
                style = np.stack([r[1] for r in batch])
                seeds = np.asarray([r[2] for r in batch], np.int64)
                out = self.transfer_batch(content, style, seeds=seeds)
                for i, (_, _, _, done) in enumerate(batch):
                    done.put({k: v[i] for k, v in out.items()})
            except Exception as e:  # noqa: BLE001 — deliver, don't die
                for _, _, _, done in batch:
                    done.put(e)
        # Drain anything still queued so no waiter hangs after stop().
        while True:
            try:
                _, _, _, done = self._queue.get_nowait()
            except queue.Empty:
                break
            done.put(RuntimeError("engine stopped"))

    def pending(self) -> int:
        """Requests queued but not yet dispatched (load-shedding signal)."""
        return self._queue.qsize()

    def stats(self) -> dict:
        return {**self._stats, "pending": self.pending()}

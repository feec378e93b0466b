"""One-process TPU batch for the round-5 evidence runs: pay relay INIT
once, run stages sequentially.  Stages selectable:
`python tools/tpu_round5_batch.py cfg ggen` (default: all).  Every stage
flushes its artifacts immediately; failures don't abort later stages.

Stage -> VERDICT r04 task map:

* ``cfg``  — style-dropout finetune of the fullscale teacher WITH EMA
  (ema_decay 0.999), the checkpoint VERDICT #2 asks generation to use.
* ``ggen`` — generation-path quality with CFG + EMA (VERDICT #2):
  tools/eval_generate.py over g in {1, 1.5, 2} x all 4 classes on the
  finetuned EMA checkpoint, 100-step DDIM, published next to the round-4
  baseline calibration (docs/results/fullscale/generate_eval_c*.json,
  g=1, raw weights, pre-finetune teacher).

Prereq: the fullscale teacher (tools/fullscale_run.py) under
runs/fullscale.
"""
import dataclasses
import sys
import time
import traceback
from pathlib import Path

REPO = Path("/root/repo")
sys.path.insert(0, str(REPO))

argv = sys.argv[1:]
STAGES = set(argv) or {"teval", "gen0", "cfg", "ggen"}

from music_style_transfer_ldm_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402

t0 = time.time()
print("devices:", jax.devices(), f"(init {time.time() - t0:.0f}s)",
      flush=True)

from music_style_transfer_ldm_tpu.config import default_config  # noqa: E402

WORK = REPO / "runs" / "fullscale"
TEACHER = WORK / "runs" / "ldm" / "ldm_final"
PACK = WORK / "train.spk"
PAIRINGS = WORK / "pairings.csv"
CFG_FINAL = REPO / "runs" / "cfg_finetune_ema" / "ldm_final"
RESULTS_GG = REPO / "docs" / "results" / "guidance_gen"


def banner(s):
    print(f"\n==== {s} ({time.time() - t0:.0f}s) ====", flush=True)


# ---- stage teval: flagship transfer eval on THIS teacher -----------------
# Refreshes docs/results/fullscale/transfer_eval.json (the 91.4 % style-
# reduction claim) so every committed quality artifact describes the same
# retrained teacher.
if "teval" in STAGES:
    banner("teval: 16-pair held-out transfer eval, 50-step DDIM")
    try:
        import tools.eval_transfer as et
        old = sys.argv
        sys.argv = ["eval_transfer", "--checkpoint", str(TEACHER),
                    "--pack", str(PACK), "--pairings", str(PAIRINGS),
                    "--n-pairs", "16", "--steps", "50",
                    "--sampler", "ddim", "--guidance", "1.0",
                    "--out-dir", str(REPO / "docs" / "results"
                                     / "fullscale"),
                    "--json-name", "transfer_eval.json"]
        try:
            assert et.main() == 0
        finally:
            sys.argv = old
    except Exception:
        traceback.print_exc()

# ---- stage gen0: unguided generation baseline on THIS teacher ------------
# Refreshes docs/results/fullscale/generate_eval_c*.json so the guided
# numbers below compare against the same weights, not round-4's teacher.
if "gen0" in STAGES:
    banner("gen0: unguided generation FAD baseline, all classes")
    import tools.eval_generate as eg
    for cls in range(4):
        try:
            old = sys.argv
            sys.argv = ["eval_generate", "--checkpoint", str(TEACHER),
                        "--pack", str(PACK), "--style-class", str(cls),
                        "--n", "16", "--steps", "100",
                        "--out", str(REPO / "docs" / "results" / "fullscale"
                                     / f"generate_eval_c{cls}.json")]
            try:
                assert eg.main() == 0
            finally:
                sys.argv = old
        except Exception:
            traceback.print_exc()

# ---- stage cfg: style-dropout finetune WITH EMA --------------------------
if "cfg" in STAGES:
    banner("cfg: style-dropout finetune + EMA (24 epochs)")
    try:
        from music_style_transfer_ldm_tpu.datasets import (
            PackedBatchLoader, PackedPairDataset, train_test_split,
        )
        from music_style_transfer_ldm_tpu.training import LDMTrainer
        cfg = default_config()
        cfg.train = dataclasses.replace(
            cfg.train, batch_size=128, style_dropout=0.2,
            learning_rate=1.25e-4, ckpt_every_epochs=50,
            style_loss_stop_gradient=False, ema_decay=0.999)
        trainer = LDMTrainer(cfg)
        ds = PackedPairDataset(PACK, PAIRINGS)
        tr, _ = train_test_split(len(ds), 0.8, seed=42)
        loader = PackedBatchLoader(ds, 128, indices=tr, shuffle=True,
                                   seed=42, dtype="uint8")
        start = 18786 // max(len(loader), 1)  # step count at ldm_final
        trainer.train(loader, num_epochs=start + 24,
                      out_dir=REPO / "runs" / "cfg_finetune_ema",
                      resume_from=TEACHER)
        print("cfg+ema finetune done", flush=True)
    except Exception:
        traceback.print_exc()

# ---- stage ggen: guided generation eval (VERDICT r04 #2) -----------------
# g sweep on the EMA finetuned checkpoint, plus the moment-matched-z_T
# variant (suffix _mm) at each g — two independent levers on the
# generation path, measured factorially.
if "ggen" in STAGES:
    banner("ggen: generation FAD, g x {plain, moment-matched} x 4 classes")
    import tools.eval_generate as eg
    for g in (1.0, 1.5, 2.0):
        for mm in ("none", "corpus"):
            for cls in range(4):
                suffix = "_mm" if mm == "corpus" else ""
                out = RESULTS_GG / f"generate_eval_c{cls}_g{g:g}{suffix}.json"
                if out.exists():
                    print(f"skip existing {out.name}", flush=True)
                    continue
                try:
                    old = sys.argv
                    sys.argv = ["eval_generate", "--checkpoint",
                                str(CFG_FINAL), "--pack", str(PACK),
                                "--style-class", str(cls),
                                "--n", "16", "--steps", "100",
                                "--guidance", str(g),
                                "--latent-stats", mm, "--out", str(out)]
                    try:
                        assert eg.main() == 0
                    finally:
                        sys.argv = old
                except Exception:
                    traceback.print_exc()

print(f"\nALL DONE in {time.time() - t0:.0f}s", flush=True)

"""CPU-fallback launcher for the round-4 cfg stage (style-dropout
finetune of the flagship teacher, tools/tpu_round4_batch.py `cfg`).

Same recipe as the batch stage with two survival changes for a
multi-hour single-core run (the TPU version takes ~15 min and needs
neither): checkpoint every 3 epochs instead of 50, and resume from the
newest intermediate checkpoint in the out_dir when one exists — so a
host restart or a relay-recovery kill (tools/tpu_round4_wrapper3.sh)
loses at most 3 epochs.  Usage: python tools/cfg_finetune_cpu.py
"""
import dataclasses
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

jax.config.update("jax_platforms", "cpu")

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.datasets import (
    PackedBatchLoader, PackedPairDataset, train_test_split,
)
from music_style_transfer_ldm_tpu.training import LDMTrainer

WORK = REPO / "runs" / "fullscale"
TEACHER = WORK / "runs" / "ldm" / "ldm_final"
OUT = REPO / "runs" / "cfg_finetune"

t0 = time.time()
ds = PackedPairDataset(WORK / "train.spk", WORK / "pairings.csv")
tr, _ = train_test_split(len(ds), 0.8, seed=42)
loader = PackedBatchLoader(ds, 128, indices=tr, shuffle=True, seed=42,
                           dtype="uint8")

cfg = default_config()
cfg.train = dataclasses.replace(
    cfg.train, batch_size=128, style_dropout=0.2,
    learning_rate=1.25e-4, ckpt_every_epochs=3,
    style_loss_stop_gradient=False)
trainer = LDMTrainer(cfg)

# Resume from the newest intermediate checkpoint if a previous attempt
# left one; otherwise start from the converged teacher.
resume = TEACHER
epochs = [(int(m.group(1)), p) for p in OUT.glob("ldm_*")
          if (m := re.fullmatch(r"ldm_(\d+)", p.name))]
if epochs:
    resume = max(epochs)[1]
print(f"resume_from={resume}", flush=True)

start = 18786 // max(len(loader), 1)  # batch-stage epoch budget parity
trainer.train(loader, num_epochs=start + 24, out_dir=OUT,
              resume_from=resume)
print(f"cfg finetune done in {time.time() - t0:.0f}s", flush=True)

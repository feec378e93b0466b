"""Pretrained-perceptual-weight transplant rehearsal (VERDICT r04 #5).

The reference's style loss runs on AudioSet-pretrained VGGish fetched at
runtime (ref: models/loss.py:56-62) and its AE/compression perceptual
term on pip-installed pretrained LPIPS (ref: models/loss.py:10).  This
air-gapped machine has neither, so the framework ships converters plus a
one-command CLI path; these tests rehearse the WHOLE pipeline with
synthetic-but-real-shape ``.pth`` files, proving it works the day real
weights appear:

    cli import-torch --vggish vggish.pth --out runs/feat_vggish
    cli import-torch --lpips  lpips.pth  --out runs/feat_lpips
    cli train --model ldm --style-features runs/feat_vggish \
        --compression-features runs/feat_lpips ...

(documented in README.md; the converters themselves are torch-parity
tested in tests/test_losses.py and tests/test_torch_interop.py).
"""

import json

import jax
import numpy as np
import pytest
import torch

from music_style_transfer_ldm_tpu import cli

RNG = np.random.RandomState(7)


def fake_torchvggish_pth(path) -> dict:
    """torchvggish ``vggish.features`` state dict with the real key names
    and shapes (VGG11-style trunk: features.{0,3,6,8,11,13})."""
    chans = [(1, 64, 0), (64, 128, 3), (128, 256, 6), (256, 256, 8),
             (256, 512, 11), (512, 512, 13)]
    sd = {}
    for cin, cout, idx in chans:
        sd[f"features.{idx}.weight"] = torch.tensor(
            RNG.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.tensor(
            RNG.randn(cout).astype(np.float32) * 0.05)
    torch.save(sd, path)
    return sd


def fake_lpips_pth(path) -> dict:
    """lpips.LPIPS(net='alex') state dict: torchvision AlexNet slices plus
    the five 1x1 linear heads."""
    convs = [("net.slice1.0", 3, 64, 11), ("net.slice2.3", 64, 192, 5),
             ("net.slice3.6", 192, 384, 3), ("net.slice4.8", 384, 256, 3),
             ("net.slice5.10", 256, 256, 3)]
    sd = {}
    for key, cin, cout, k in convs:
        sd[f"{key}.weight"] = torch.tensor(
            RNG.randn(cout, cin, k, k).astype(np.float32) * 0.05)
        sd[f"{key}.bias"] = torch.tensor(
            RNG.randn(cout).astype(np.float32) * 0.05)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(RNG.randn(1, c, 1, 1)).astype(np.float32))
    torch.save(sd, path)
    return sd


def test_import_torch_vggish_roundtrip(tmp_path):
    """cli import-torch --vggish: .pth -> converted orbax checkpoint whose
    params equal the converter's output exactly."""
    from music_style_transfer_ldm_tpu.losses.vggish import (
        convert_torchvggish_state_dict,
    )
    from music_style_transfer_ldm_tpu.training.checkpoint import (
        restore_pytree,
    )
    pth = tmp_path / "vggish.pth"
    sd = fake_torchvggish_pth(pth)
    out = tmp_path / "feat_vggish"
    assert cli.main(["import-torch", "--vggish", str(pth),
                     "--out", str(out)]) == 0
    payload = restore_pytree(out)
    assert cli._decode_kind(payload["kind"]) == "vggish"
    want = convert_torchvggish_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(payload["params"]),
            jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_import_torch_lpips_roundtrip(tmp_path):
    from music_style_transfer_ldm_tpu.training.checkpoint import (
        restore_pytree,
    )
    pth = tmp_path / "lpips.pth"
    fake_lpips_pth(pth)
    out = tmp_path / "feat_lpips"
    assert cli.main(["import-torch", "--lpips", str(pth),
                     "--out", str(out)]) == 0
    payload = restore_pytree(out)
    assert cli._decode_kind(payload["kind"]) == "lpips"
    # The converted tree must drive the flax LPIPS module directly.
    from music_style_transfer_ldm_tpu.losses.lpips import LPIPS
    x = np.zeros((1, 64, 64, 1), np.float32)
    d = LPIPS().apply({"params": payload["params"]}, x, x)
    assert float(d) < 1e-8


def test_load_feature_params_kind_mismatch(tmp_path):
    """Wiring a VGGish checkpoint into the LPIPS slot is a hard error,
    not silent shape-luck."""
    pth = tmp_path / "vggish.pth"
    fake_torchvggish_pth(pth)
    out = tmp_path / "feat"
    assert cli.main(["import-torch", "--vggish", str(pth),
                     "--out", str(out)]) == 0
    with pytest.raises(SystemExit, match="expects 'lpips'"):
        cli._load_feature_params(str(out), "lpips")


def test_transplanted_params_reach_the_loss(tmp_path):
    """The trainer must USE the transplanted trunks: its style/compression
    feature metrics carry exactly the converted params, and the resulting
    style distance differs from the random-trunk default (same inputs)."""
    import dataclasses

    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.training import LDMTrainer

    vggish_out = tmp_path / "fv"
    lpips_out = tmp_path / "fl"
    fake_torchvggish_pth(tmp_path / "v.pth")
    fake_lpips_pth(tmp_path / "l.pth")
    assert cli.main(["import-torch", "--vggish", str(tmp_path / "v.pth"),
                     "--out", str(vggish_out)]) == 0
    assert cli.main(["import-torch", "--lpips", str(tmp_path / "l.pth"),
                     "--out", str(lpips_out)]) == 0

    vp = cli._load_feature_params(str(vggish_out), "vggish")
    lp = cli._load_feature_params(str(lpips_out), "lpips")

    cfg = default_config()
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    cfg.train = dataclasses.replace(cfg.train, compute_dtype="float32")
    trainer = LDMTrainer(cfg, style_feature_params=vp,
                         compression_feature_params=lp)
    trainer.init_state(0)  # must NOT re-init over the transplant
    got = jax.tree_util.tree_leaves(trainer.style_feature.params)
    want = jax.tree_util.tree_leaves(vp)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(got, want))

    a = jnp.asarray(RNG.rand(2, 64, 64, 1).astype(np.float32))
    b = jnp.asarray(RNG.rand(2, 64, 64, 1).astype(np.float32))
    d_transplant = float(trainer.style_feature.distance(
        trainer.style_feature.params, a, b))
    default = LDMTrainer(cfg)  # fixed-seed random trunks
    default.init_state(0)
    d_random = float(default.style_feature.distance(
        default.style_feature.params, a, b))
    assert np.isfinite(d_transplant) and d_transplant > 0
    assert abs(d_transplant - d_random) > 1e-6


def test_transplant_retrain_eval_pipeline(tmp_path, monkeypatch, capsys):
    """The full rehearsal: fake .pth -> cli import-torch -> cli train
    --model ldm (2 epochs on a tiny PNG dataset, REAL 128x128 reference
    geometry) -> cli diagnose on the produced checkpoint.  Every stage is
    the shipping CLI surface, not internals."""
    monkeypatch.chdir(tmp_path)
    # Tiny dataset with the real image geometry (128x130 mel PNGs).
    from PIL import Image
    root = tmp_path / "processed_images"
    for cls in ("piano", "guitar"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(4):
            img = (RNG.rand(128, 130) * 255).astype(np.uint8)
            Image.fromarray(img, mode="L").save(d / f"{cls}_{i}.png")
    assert cli.main(["generate-pairings", "--root", str(root),
                     "--num-pairs", "8", "--output",
                     str(tmp_path / "pairs.csv")]) == 0

    fake_torchvggish_pth(tmp_path / "v.pth")
    fake_lpips_pth(tmp_path / "l.pth")
    assert cli.main(["import-torch", "--vggish", str(tmp_path / "v.pth"),
                     "--out", str(tmp_path / "fv")]) == 0
    assert cli.main(["import-torch", "--lpips", str(tmp_path / "l.pth"),
                     "--out", str(tmp_path / "fl")]) == 0

    out_dir = tmp_path / "run"
    assert cli.main(["train", "--model", "ldm",
                     "--data-root", str(root),
                     "--pairing-file", str(tmp_path / "pairs.csv"),
                     "--epochs", "2",
                     "--style-features", str(tmp_path / "fv"),
                     "--compression-features", str(tmp_path / "fl"),
                     "--out-dir", str(out_dir)]) == 0
    stdout = capsys.readouterr().out
    assert "transplanted vggish feature weights loaded" in stdout
    assert "transplanted lpips feature weights loaded" in stdout

    # Both epochs trained to finite losses.
    rows = (out_dir / "metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs
    header = rows[0].split(",")
    for row in rows[1:]:
        vals = dict(zip(header, row.split(",")))
        assert np.isfinite(float(vals["total_loss"]))
        assert float(vals["style_loss"]) > 0.0

    # Eval stage: diagnose the produced checkpoint (param table + style
    # probe) through the CLI.
    assert cli.main(["diagnose", "--checkpoint",
                     str(out_dir / "ldm_final"), "--raw-weights"]) == 0
    out = capsys.readouterr().out
    assert "parameter counts" in out and "style embedding stats" in out

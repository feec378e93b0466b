"""Convert trained reference PyTorch checkpoints to this framework.

A user of the reference who has trained ``encoder.pth`` / ``decoder.pth`` /
``ldm_<epoch>.pth`` files (ref: models/train.py:111-114,270-272) can load
them here and keep their weights.  Input is a torch ``state_dict`` already
converted to numpy arrays (e.g. ``{k: v.numpy() for k, v in sd.items()}``
— torch itself is not imported by this module).

Layer mappings (all verified numerically against torch on CPU):

* Conv2d          weight [O,I,kh,kw]  -> kernel [kh,kw,I,O]
* ConvTranspose2d weight [I,O,kh,kw]  -> kernel flip(kh,kw) of [kh,kw,I,O]
                  (torch's transpose conv correlates with the spatially
                  flipped kernel relative to flax's ConvTranspose)
* Linear          weight [O,I]        -> kernel [I,O] (transpose)
* BatchNorm2d     weight/bias         -> scale/bias;
                  running_mean/var    -> batch_stats mean/var
* MultiheadAttention  in_proj_weight [3E,E] rows split into q/k/v,
                  each transposed into the q/k/v Dense kernels;
                  out_proj likewise.

The reference's full-LDM checkpoints are flat dicts with ``encoder.`` /
``decoder.`` / ``unet.`` / ``style_encoder.`` / ``noise_scheduler.``
prefixes (ref: models/model.py:279-301); ``convert_ldm_state_dict``
performs the same prefix split.  Schedule buffers are recomputed from
config, not copied.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # tolerate live torch tensors
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])  # [O, I, kh, kw]
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[f"{key}.bias"])}


def _convT(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])  # [I, O, kh, kw]
    k = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # flip kh, kw
    return {"kernel": np.ascontiguousarray(k),
            "bias": _np(sd[f"{key}.bias"])}


def _bn(sd: Dict, key: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{key}.weight"]),
              "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])}
    return params, stats


def _linear(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _mha(sd: Dict, key: str) -> Dict[str, Any]:
    w = _np(sd[f"{key}.in_proj_weight"])  # [3E, E]
    b = _np(sd[f"{key}.in_proj_bias"])    # [3E]
    e = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {"kernel": w[i * e:(i + 1) * e].T,
                     "bias": b[i * e:(i + 1) * e]}
    out["out_proj"] = {"kernel": _np(sd[f"{key}.out_proj.weight"]).T,
                       "bias": _np(sd[f"{key}.out_proj.bias"])}
    return out


def _strip(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def convert_encoder_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """SpectrogramEncoder: torch Sequential 'encoder' indices
    0/1/3/4/6/7 = conv/bn x3 (ref: model.py:16-25).
    Accepts either 'encoder.0.weight' keys or bare '0.weight' keys.
    Returns (params, batch_stats)."""
    if any(k.startswith("encoder.") for k in sd):
        sd = _strip(sd, "encoder.")
    params, stats = {}, {}
    for i, (conv_idx, bn_idx) in enumerate([(0, 1), (3, 4), (6, 7)], 1):
        params[f"conv{i}"] = _conv(sd, str(conv_idx))
        p, s = _bn(sd, str(bn_idx))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def convert_decoder_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """SpectrogramDecoder: Sequential 'decoder' indices 0/1/3/4/6 =
    convT/bn/convT/bn/convT (ref: model.py:37-46)."""
    if any(k.startswith("decoder.") for k in sd):
        sd = _strip(sd, "decoder.")
    params, stats = {}, {}
    for i, convt_idx in enumerate([0, 3, 6], 1):
        params[f"deconv{i}"] = _convT(sd, str(convt_idx))
    for i, bn_idx in enumerate([1, 4], 1):
        p, s = _bn(sd, str(bn_idx))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def convert_style_encoder_state_dict(sd: Dict) -> Dict:
    """StyleEncoder: attributes enc1..enc6 (ref: model.py:61-68)."""
    return {f"enc{i}": _conv(sd, f"enc{i}") for i in range(1, 7)}


def convert_unet_state_dict(sd: Dict) -> Dict:
    """UNet (ref: model.py:163-231): time_mlp Linears at Sequential
    indices 1 and 3, enc1..enc4, cross_attention1/2 (MHA), bottleneck,
    dec4..dec2 (ConvTranspose2d), dec1 (Conv2d)."""
    params: Dict[str, Any] = {
        "time_fc1": _linear(sd, "time_mlp.1"),
        "time_fc2": _linear(sd, "time_mlp.3"),
        "bottleneck": _conv(sd, "bottleneck"),
        "dec1": _conv(sd, "dec1"),
    }
    for i in range(1, 5):
        params[f"enc{i}"] = _conv(sd, f"enc{i}")
    for i in (2, 3, 4):
        params[f"dec{i}"] = _convT(sd, f"dec{i}")
    params["cross_attention1"] = _mha(sd, "cross_attention1.multihead_attn")
    params["cross_attention2"] = _mha(sd, "cross_attention2.multihead_attn")
    return params


def convert_ldm_state_dict(sd: Dict) -> Dict[str, Any]:
    """Full reference LDM checkpoint -> {'params', 'batch_stats'}
    (prefix split as in ref: model.py:279-301; noise_scheduler buffers are
    recomputed from config rather than copied)."""
    enc_p, enc_s = convert_encoder_state_dict(_strip(sd, "encoder."))
    dec_p, dec_s = convert_decoder_state_dict(_strip(sd, "decoder."))
    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "unet": convert_unet_state_dict(_strip(sd, "unet.")),
        "style_encoder": convert_style_encoder_state_dict(
            _strip(sd, "style_encoder.")),
    }
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return {"params": params, "batch_stats": batch_stats}


def convert_autoencoder_state_dicts(encoder_sd: Dict, decoder_sd: Dict
                                    ) -> Dict[str, Any]:
    """encoder.pth + decoder.pth -> the AE payload the trainers consume
    (same layout as training.checkpoint.save_autoencoder)."""
    enc_p, enc_s = convert_encoder_state_dict(encoder_sd)
    dec_p, dec_s = convert_decoder_state_dict(decoder_sd)
    return {"params": {"encoder": enc_p, "decoder": dec_p},
            "batch_stats": {"encoder": enc_s, "decoder": dec_s}}

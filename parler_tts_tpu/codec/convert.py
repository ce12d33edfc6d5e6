"""Convert descript-DAC torch checkpoints to our JAX DAC params.

Handles the torch weight-norm parametrization the reference re-applies at load
time (`/root/reference/parler_tts/dac_wrapper/modeling_dac.py:148-164`): both the
new `parametrizations.weight.original{0,1}` form and the legacy
`weight_g`/`weight_v` form are FOLDED into plain kernels
(w = g * v / ||v||, norm over all dims except dim 0 — torch weight_norm dim=0).

Name mapping follows the descript `DAC` module tree (encoder.block.N...,
decoder.model.N..., quantizer.quantizers.K...), which is exactly what a
`DACModel` wrapper checkpoint contains under its `model.` prefix.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import DACConfig


def _folded_weight(tensors: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Resolve `{prefix}.weight` with weight-norm folding if parametrized."""
    if f"{prefix}.parametrizations.weight.original0" in tensors:
        g = np.asarray(tensors[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(tensors[f"{prefix}.parametrizations.weight.original1"])
    elif f"{prefix}.weight_g" in tensors:
        g = np.asarray(tensors[f"{prefix}.weight_g"])
        v = np.asarray(tensors[f"{prefix}.weight_v"])
    else:
        return np.asarray(tensors[f"{prefix}.weight"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * (v / norm)).astype(v.dtype)


def _conv(tensors, prefix) -> Dict[str, np.ndarray]:
    """torch Conv1d (out, in, k) -> ours (k, in, out)."""
    w = _folded_weight(tensors, prefix)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": np.asarray(tensors[f"{prefix}.bias"]),
    }


def _conv_transpose(tensors, prefix) -> Dict[str, np.ndarray]:
    """torch ConvTranspose1d (in, out, k) -> ours (k, in, out)."""
    w = _folded_weight(tensors, prefix)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
        "bias": np.asarray(tensors[f"{prefix}.bias"]),
    }


def _snake(tensors, prefix) -> Dict[str, np.ndarray]:
    """torch alpha (1, C, 1) -> ours (1, 1, C)."""
    return {"alpha": np.asarray(tensors[f"{prefix}.alpha"]).transpose(0, 2, 1)}


def _residual_unit(tensors, prefix) -> Dict:
    return {
        "snake1": _snake(tensors, f"{prefix}.block.0"),
        "conv1": _conv(tensors, f"{prefix}.block.1"),
        "snake2": _snake(tensors, f"{prefix}.block.2"),
        "conv2": _conv(tensors, f"{prefix}.block.3"),
    }


def convert_dac_params(
    tensors: Mapping[str, np.ndarray], config: DACConfig, prefix: str = "model."
) -> Dict:
    """Full descript-DAC state dict -> our `DACModel` params.

    `prefix` is `model.` for a bare `DACModel` wrapper checkpoint and
    `audio_encoder.model.` inside the composite Parler checkpoint.
    """
    p = prefix

    encoder: Dict = {"conv_in": _conv(tensors, f"{p}encoder.block.0")}
    for i in range(len(config.encoder_rates)):
        bp = f"{p}encoder.block.{1 + i}"
        encoder[f"block_{i}"] = {
            "res1": _residual_unit(tensors, f"{bp}.block.0"),
            "res2": _residual_unit(tensors, f"{bp}.block.1"),
            "res3": _residual_unit(tensors, f"{bp}.block.2"),
            "snake": _snake(tensors, f"{bp}.block.3"),
            "down": _conv(tensors, f"{bp}.block.4"),
        }
    n_enc = 1 + len(config.encoder_rates)
    encoder["snake_out"] = _snake(tensors, f"{p}encoder.block.{n_enc}")
    encoder["conv_out"] = _conv(tensors, f"{p}encoder.block.{n_enc + 1}")

    decoder: Dict = {"conv_in": _conv(tensors, f"{p}decoder.model.0")}
    for i in range(len(config.decoder_rates)):
        bp = f"{p}decoder.model.{1 + i}"
        decoder[f"block_{i}"] = {
            "snake": _snake(tensors, f"{bp}.block.0"),
            "up": _conv_transpose(tensors, f"{bp}.block.1"),
            "res1": _residual_unit(tensors, f"{bp}.block.2"),
            "res2": _residual_unit(tensors, f"{bp}.block.3"),
            "res3": _residual_unit(tensors, f"{bp}.block.4"),
        }
    n_dec = 1 + len(config.decoder_rates)
    decoder["snake_out"] = _snake(tensors, f"{p}decoder.model.{n_dec}")
    decoder["conv_out"] = _conv(tensors, f"{p}decoder.model.{n_dec + 1}")

    cbs, ipk, ipb, opk, opb = [], [], [], [], []
    for k in range(config.num_codebooks):
        qp = f"{p}quantizer.quantizers.{k}"
        cbs.append(np.asarray(tensors[f"{qp}.codebook.weight"]))
        wi = _folded_weight(tensors, f"{qp}.in_proj")  # (d_cb, latent, 1)
        ipk.append(wi[:, :, 0].T)                      # (latent, d_cb)
        ipb.append(np.asarray(tensors[f"{qp}.in_proj.bias"]))
        wo = _folded_weight(tensors, f"{qp}.out_proj")  # (latent, d_cb, 1)
        opk.append(wo[:, :, 0].T)                       # (d_cb, latent)
        opb.append(np.asarray(tensors[f"{qp}.out_proj.bias"]))

    quantizer = {
        "codebooks": np.stack(cbs),
        "in_proj_kernel": np.stack(ipk),
        "in_proj_bias": np.stack(ipb),
        "out_proj_kernel": np.stack(opk),
        "out_proj_bias": np.stack(opb),
    }

    return {"encoder": encoder, "quantizer": quantizer, "decoder": decoder}


# --------------------------------------------------------------------- export
def _split_weight_norm(w: np.ndarray, v_scale: float = 1.0):
    """Plain torch-layout weight -> (weight_g, weight_v) such that torch's
    weight_norm reconstruction g * v/||v|| (norm over dims 1..N, dim=0) yields
    `w` exactly. Any positive per-direction scale of v works; `v_scale != 1`
    exercises real folding in the consumer."""
    axes = tuple(range(1, w.ndim))
    g = np.sqrt(np.sum(w.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return g.astype(w.dtype), (w * v_scale).astype(w.dtype)


def export_dac_params(
    params: Dict, config: DACConfig, prefix: str = "model.",
    weight_norm: bool = True, v_scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_dac_params`: our `DACModel` params -> a descript-DAC
    torch state dict (weight-norm parametrized like the checkpoints the
    reference re-wraps at load, `dac_wrapper/modeling_dac.py:148-164`).
    Used by the hub-push bridge and the checkpoint-fidelity harness."""
    out: Dict[str, np.ndarray] = {}

    def put_conv(prefix_t: str, leaf: Dict, transpose):
        w = np.ascontiguousarray(np.asarray(leaf["kernel"]).transpose(*transpose))
        if weight_norm:
            g, v = _split_weight_norm(w, v_scale)
            out[f"{prefix_t}.weight_g"] = g
            out[f"{prefix_t}.weight_v"] = v
        else:
            out[f"{prefix_t}.weight"] = w
        out[f"{prefix_t}.bias"] = np.asarray(leaf["bias"])

    conv = lambda pt, leaf: put_conv(pt, leaf, (2, 1, 0))       # (k,in,out)->(out,in,k)  # noqa: E731
    convT = lambda pt, leaf: put_conv(pt, leaf, (1, 2, 0))      # (k,in,out)->(in,out,k)  # noqa: E731
    snake = lambda pt, leaf: out.__setitem__(                   # noqa: E731
        f"{pt}.alpha", np.ascontiguousarray(np.asarray(leaf["alpha"]).transpose(0, 2, 1))
    )

    def res_unit(pt: str, leaf: Dict):
        snake(f"{pt}.block.0", leaf["snake1"])
        conv(f"{pt}.block.1", leaf["conv1"])
        snake(f"{pt}.block.2", leaf["snake2"])
        conv(f"{pt}.block.3", leaf["conv2"])

    p = prefix
    enc = params["encoder"]
    conv(f"{p}encoder.block.0", enc["conv_in"])
    for i in range(len(config.encoder_rates)):
        bp, blk = f"{p}encoder.block.{1 + i}", enc[f"block_{i}"]
        res_unit(f"{bp}.block.0", blk["res1"])
        res_unit(f"{bp}.block.1", blk["res2"])
        res_unit(f"{bp}.block.2", blk["res3"])
        snake(f"{bp}.block.3", blk["snake"])
        conv(f"{bp}.block.4", blk["down"])
    n_enc = 1 + len(config.encoder_rates)
    snake(f"{p}encoder.block.{n_enc}", enc["snake_out"])
    conv(f"{p}encoder.block.{n_enc + 1}", enc["conv_out"])

    dec = params["decoder"]
    conv(f"{p}decoder.model.0", dec["conv_in"])
    for i in range(len(config.decoder_rates)):
        bp, blk = f"{p}decoder.model.{1 + i}", dec[f"block_{i}"]
        snake(f"{bp}.block.0", blk["snake"])
        convT(f"{bp}.block.1", blk["up"])
        res_unit(f"{bp}.block.2", blk["res1"])
        res_unit(f"{bp}.block.3", blk["res2"])
        res_unit(f"{bp}.block.4", blk["res3"])
    n_dec = 1 + len(config.decoder_rates)
    snake(f"{p}decoder.model.{n_dec}", dec["snake_out"])
    conv(f"{p}decoder.model.{n_dec + 1}", dec["conv_out"])

    q = params["quantizer"]
    for k in range(config.num_codebooks):
        qp = f"{p}quantizer.quantizers.{k}"
        out[f"{qp}.codebook.weight"] = np.asarray(q["codebooks"][k])
        wi = np.asarray(q["in_proj_kernel"][k]).T[:, :, None]   # (d_cb, latent, 1)
        wo = np.asarray(q["out_proj_kernel"][k]).T[:, :, None]  # (latent, d_cb, 1)
        for pt, w in ((f"{qp}.in_proj", wi), (f"{qp}.out_proj", wo)):
            if weight_norm:
                g, v = _split_weight_norm(np.ascontiguousarray(w), v_scale)
                out[f"{pt}.weight_g"] = g
                out[f"{pt}.weight_v"] = v
            else:
                out[f"{pt}.weight"] = np.ascontiguousarray(w)
        out[f"{qp}.in_proj.bias"] = np.asarray(q["in_proj_bias"][k])
        out[f"{qp}.out_proj.bias"] = np.asarray(q["out_proj_bias"][k])
    return out

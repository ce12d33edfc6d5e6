"""Int8 weight-only serving mode: quality + structural checks."""

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.config import GenerationConfig
from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.runtime.generate import make_generate
from parler_tts_tpu.training import make_optimizer
from parler_tts_tpu.utils.quantize import (
    dequantize_for_reference,
    quantize_decoder_params,
    quantize_kernel,
)

from test_training_step import init_state, make_batch, tiny_config


def test_quantize_kernel_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 512)).astype(np.float32) * 0.05
    q = quantize_kernel(w)
    assert q["w_q"].dtype == np.int8
    back = np.asarray(dequantize_for_reference(q))
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.01  # per-channel int8 quantization error bound


def test_quantized_model_logits_close():
    cfg = tiny_config()
    base = ParlerTTS(cfg)
    quant = ParlerTTS(cfg, weight_quant=True)
    params = init_state(base, make_optimizer()).params
    qparams = quantize_decoder_params(params)

    batch = make_batch(b=2, seed=3)
    args = (batch.input_ids, batch.attention_mask, batch.prompt_input_ids,
            batch.prompt_attention_mask, batch.labels)
    logits_a, _ = base.apply({"params": params}, *args)
    logits_b, _ = quant.apply({"params": qparams}, *args)
    a, b = np.asarray(logits_a), np.asarray(logits_b)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, f"quantized logits rel err {rel}"
    # top-1 agreement on nearly all positions
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.98, f"top-1 agreement {agree}"


def test_quantized_generation_runs():
    cfg = tiny_config()
    base = ParlerTTS(cfg)
    quant = ParlerTTS(cfg, weight_quant=True)
    params = init_state(base, make_optimizer()).params
    qparams = quantize_decoder_params(params)

    gen = GenerationConfig(
        max_length=16, min_new_tokens=4, do_sample=False,
        bos_token_id=89, pad_token_id=88, eos_token_id=88,
    )
    rng = np.random.default_rng(5)
    desc = rng.integers(0, 120, (1, 7)).astype(np.int32)
    prompt = rng.integers(0, 256, (1, 4)).astype(np.int32)
    out = make_generate(quant, gen)(
        qparams, desc, np.ones((1, 7), np.int32), prompt, np.ones((1, 4), np.int32),
        jax.random.key(0),
    )
    assert out.codes.shape == (1, 4, 12)
    assert int(out.steps) >= 5
    # quantized params really are int8 where expected
    leaf = qparams["decoder"]["decoder"]["layers_0"]["fc1"]["w_q"]
    assert leaf.dtype == np.int8


def test_quant_matmul_kernel_matches_reference():
    from parler_tts_tpu.ops.pallas.quant_matmul import (
        quant_matmul,
        quant_matmul_reference,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 512)) * 0.3, jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, size=(512, 256)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, size=(256,)), jnp.float32)
    got = quant_matmul(x, w_q, scale, block_n=128, block_k=256, interpret=True)
    want = quant_matmul_reference(x, w_q, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3)

    # multi-row (prefill) path
    x2 = jnp.asarray(rng.normal(size=(8, 512)) * 0.3, jnp.float32)
    got2 = quant_matmul(x2, w_q, scale, block_n=128, block_k=512, interpret=True)
    want2 = quant_matmul_reference(x2, w_q, scale)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4, rtol=1e-3)


def test_xla_impl_matches_pallas_impl():
    """weight_quant="xla" (fused-convert dot) must produce the same logits as
    the Pallas dequant kernel up to fp accumulation noise — they consume the
    SAME quantized params."""
    cfg = tiny_config()
    pallas_m = ParlerTTS(cfg, weight_quant=True)
    xla_m = ParlerTTS(cfg, weight_quant="xla")
    params = init_state(ParlerTTS(cfg), make_optimizer()).params
    qparams = quantize_decoder_params(params)

    batch = make_batch(b=2, seed=5)
    args = (batch.input_ids, batch.attention_mask, batch.prompt_input_ids,
            batch.prompt_attention_mask, batch.labels)
    la, _ = pallas_m.apply({"params": qparams}, *args)
    lb, _ = xla_m.apply({"params": qparams}, *args)
    a, b = np.asarray(la), np.asarray(lb)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 2e-2, f"impl mismatch rel err {rel}"
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.99

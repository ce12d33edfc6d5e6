"""Speculative (self-drafting Jacobi) decoding correctness.

Three layers of evidence:
  1. `speculative_accept` alone reproduces the target distribution p for
     arbitrary (p, q) pairs (the rejection identity, brute-force empirical);
  2. greedy speculative generation is TOKEN-IDENTICAL to the AR greedy loop
     (`generate_tokens`) across window sizes, prompts, voice steering,
     left-padding, and min_new_tokens;
  3. sampled speculative generation matches the AR sampling DISTRIBUTION:
     per-position marginals over a small-vocab model agree within sampling
     noise (the draws themselves differ — the rng stream is consumed
     differently — which is exactly the speculative-sampling contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5Config,
)
from parler_tts_tpu.models.parler import ParlerTTS
from parler_tts_tpu.ops.sampling import speculative_accept
from parler_tts_tpu.runtime.generate import make_generate
from parler_tts_tpu.runtime.speculative import make_generate_speculative

PAD, BOS = 16, 17  # small-vocab v1-style layout: pad == eos == codebook_size

CFG = ParlerTTSConfig(
    text_encoder=T5Config(
        vocab_size=60, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        dropout_rate=0.0,
    ),
    audio_encoder=DACConfig(num_codebooks=3, codebook_size=PAD),
    decoder=DecoderConfig(
        vocab_size=24, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, num_codebooks=3,
        max_position_embeddings=128, pad_token_id=PAD, bos_token_id=BOS,
        eos_token_id=PAD, dropout=0.0,
    ),
    vocab_size=96,
    pad_token_id=PAD,
    decoder_start_token_id=BOS,
)


def _gen_cfg(**kw):
    base = dict(
        max_length=24, min_new_tokens=4, do_sample=False,
        bos_token_id=BOS, pad_token_id=PAD, eos_token_id=PAD,
    )
    base.update(kw)
    return GenerationConfig(**base)


@pytest.fixture(scope="module")
def setup():
    model = ParlerTTS(CFG)
    params = model.init(
        jax.random.key(3),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, 3), jnp.int32),
    )["params"]
    return model, params


def _inputs(b=1, s_d=5, s_p=4, seed=0, left_pad=0):
    rng = np.random.default_rng(seed)
    desc = rng.integers(1, 50, size=(b, s_d)).astype(np.int32)
    dm = np.ones((b, s_d), np.int32)
    prompt = rng.integers(1, 90, size=(b, s_p)).astype(np.int32)
    pm = np.ones((b, s_p), np.int32)
    if left_pad:
        prompt[:, :left_pad] = 0
        pm[:, :left_pad] = 0
    return (jnp.asarray(desc), jnp.asarray(dm),
            jnp.asarray(prompt), jnp.asarray(pm))


# --------------------------------------------------------------------------
def test_speculative_accept_reproduces_target():
    """final ~ p exactly, for cand ~ q, across several (p, q) shapes."""
    v, n = 8, 200_000
    rng = np.random.default_rng(0)
    for trial in range(3):
        p = rng.dirichlet(np.full(v, 0.4))
        q = rng.dirichlet(np.full(v, 0.7))
        if trial == 2:
            q = p.copy()  # degenerate: empty residual path
        key = jax.random.key(trial)
        kc, ku, kg = jax.random.split(key, 3)
        cand = jax.random.categorical(kc, jnp.log(jnp.asarray(q))[None], shape=(n,))
        u = jax.random.uniform(ku, (n,))
        g = jax.random.gumbel(kg, (n, v))
        final, acc = speculative_accept(
            jnp.broadcast_to(jnp.asarray(p), (n, v)),
            jnp.broadcast_to(jnp.asarray(q), (n, v)),
            cand.astype(jnp.int32), u, g,
        )
        emp = np.bincount(np.asarray(final), minlength=v) / n
        np.testing.assert_allclose(emp, p, atol=5e-3)
        exp_acc = np.minimum(p, q).sum()  # E[min(1, p/q)] under cand~q
        assert abs(float(jnp.mean(acc)) - exp_acc) < 5e-3


# --------------------------------------------------------------------------
@pytest.mark.parametrize("window", [1, 2, 4, 7])
def test_greedy_token_identical(setup, window):
    model, params = setup
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=window)
    for seed in range(3):
        inp = _inputs(seed=seed)
        a = ar(params, *inp, jax.random.key(7))
        s, stats = sp(params, *inp, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
        np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))
        np.testing.assert_array_equal(np.asarray(a.delayed_ids), np.asarray(s.delayed_ids))
        assert int(stats.forwards) >= 1
        assert int(stats.columns) == int(s.steps) - (1 + 1)  # t0 = s0+1 = 2


def test_greedy_identical_voice_steering_and_left_pad(setup):
    model, params = setup
    gen = _gen_cfg(do_sample=False, min_new_tokens=2)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4)
    inp = _inputs(seed=5, left_pad=2)
    codes0 = jnp.asarray(
        np.random.default_rng(1).integers(0, PAD, size=(1, 3, 3)), jnp.int32
    )
    a = ar(params, *inp, jax.random.key(0), codes0)
    s, _ = sp(params, *inp, jax.random.key(0), codes0)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


def test_greedy_identical_batched(setup):
    model, params = setup
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=3)
    inp = _inputs(b=3, seed=2)
    a = ar(params, *inp, jax.random.key(0))
    s, _ = sp(params, *inp, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


# --------------------------------------------------------------------------
def _marginals(delayed, v):
    """Per-(codebook, column) empirical marginal over the batch axis."""
    b, k, t = delayed.shape
    out = np.zeros((k, t, v))
    for ki in range(k):
        for ti in range(t):
            out[ki, ti] = np.bincount(delayed[:, ki, ti], minlength=v) / b
    return out


@pytest.mark.parametrize(
    "gen_kw",
    [
        dict(do_sample=True, temperature=1.0),
        dict(do_sample=True, temperature=0.7, codebook_guard=PAD),
        dict(do_sample=True, top_k=6),  # non-hoistable chain (in-scan warpers)
    ],
)
def test_sampled_distribution_preserved(setup, gen_kw):
    """Marginal distributions of speculative sampling match AR sampling.

    Identical inputs replicated over a large batch; AR and speculative runs
    use fresh seeds. The total-variation distance between per-position
    marginals must sit within sampling noise (calibrated by comparing two
    independent AR runs).
    """
    model, params = setup
    gen = _gen_cfg(max_length=12, min_new_tokens=3, **gen_kw)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4)
    b = 768
    d, dm, p, pm = _inputs(seed=3)
    rep = lambda x: jnp.repeat(x, b, axis=0)
    inp = (rep(d), rep(dm), rep(p), rep(pm))
    v = CFG.decoder.vocab_size

    a1 = np.asarray(ar(params, *inp, jax.random.key(11)).delayed_ids)
    a2 = np.asarray(ar(params, *inp, jax.random.key(12)).delayed_ids)
    s1, stats = sp(params, *inp, jax.random.key(13))
    s1 = np.asarray(s1.delayed_ids)

    m_a1, m_a2, m_s = _marginals(a1, v), _marginals(a2, v), _marginals(s1, v)
    tv_noise = 0.5 * np.abs(m_a1 - m_a2).sum(-1)   # AR-vs-AR sampling noise
    tv_spec = 0.5 * np.abs(m_a1 - m_s).sum(-1)     # AR-vs-speculative
    # speculative TV must be statistically indistinguishable from noise:
    # bound by noise + 3x the binomial std-err scale of a TV estimate
    bound = tv_noise.mean() + 3.0 * np.sqrt(v / (4 * b))
    assert tv_spec.mean() < bound, (tv_spec.mean(), tv_noise.mean(), bound)
    assert tv_spec.max() < tv_noise.max() + 5 * np.sqrt(v / (4 * b))
    # with B=768 coupled rows, the accept horizon degrades to ~1 column per
    # forward, but never below (the residual draw always finalizes one)
    assert int(stats.columns) >= int(stats.forwards)


def test_sampled_lengths_distribution(setup):
    """EOS/early-exit behavior matches in distribution, not just tokens."""
    model, params = setup
    gen = _gen_cfg(max_length=16, min_new_tokens=0, do_sample=True)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4)
    b = 512
    d, dm, p, pm = _inputs(seed=4)
    rep = lambda x: jnp.repeat(x, b, axis=0)
    inp = (rep(d), rep(dm), rep(p), rep(pm))
    la = np.asarray(ar(params, *inp, jax.random.key(21)).lengths)
    lb = np.asarray(ar(params, *inp, jax.random.key(22)).lengths)
    ls = np.asarray(sp(params, *inp, jax.random.key(23))[0].lengths)
    noise = abs(la.mean() - lb.mean())
    assert abs(la.mean() - ls.mean()) <= noise + 3 * la.std() / np.sqrt(b)


def test_sampled_finished_entries_propose_pad(setup):
    """Once a (row, codebook) entry has recorded EOS, next-window proposals
    for it must be PAD with q = delta_PAD. Proposals drawn from the
    pre-pad-forcing softmax would reject nearly every window column for a
    finished entry (its verify target is the forced-PAD distribution),
    dragging the WHOLE batch's accept horizon to ~1 column/forward for the
    EOS-cascade tail — and, at B > 1, for the entire remainder after the
    shortest stream finishes."""
    from parler_tts_tpu.ops.sampling import EosState
    from parler_tts_tpu.runtime.speculative import (
        _make_spec_step,
        make_stream_functions_speculative,
    )

    model, params = setup
    w = 4
    gen = _gen_cfg(max_length=20, min_new_tokens=0, do_sample=True)
    prefill_fn, _ = make_stream_functions_speculative(model, gen, window=w)
    inp = _inputs(b=2, seed=12)
    state = prefill_fn(params, *inp, jax.random.key(0))

    # mark row 0 fully finished (EOS recorded on every codebook)
    eos_seen = np.asarray(state.eos.eos_seen).copy()
    eos_seen[0, :] = True
    fu = np.asarray(state.eos.first_unfinished).copy()
    fu[0] = CFG.decoder.num_codebooks - 1
    state = state.replace(
        eos=EosState(eos_seen=jnp.asarray(eos_seen),
                     first_unfinished=jnp.asarray(fu))
    )

    spec_step = _make_spec_step(model, gen, w)
    s1 = spec_step({"params": params}, state)
    # row 0's next-window candidates are PAD with q = delta_PAD
    assert np.all(np.asarray(s1.cand_toks)[:, 0, :] == PAD)
    q0 = np.asarray(s1.cand_q)[:, 0, :, :]
    np.testing.assert_allclose(q0[..., PAD], 1.0)
    np.testing.assert_allclose(q0.sum(-1), 1.0, atol=1e-5)
    # row 1 (active) keeps its real proposal distributions
    q1 = np.asarray(s1.cand_q)[:, 1, :, :]
    assert not np.allclose(q1[..., PAD], 1.0)

    # at the next verify the PAD proposals match the forced-PAD finals: every
    # column row 0 finalizes from here on is PAD (or a pattern override)
    s2 = spec_step({"params": params}, s1)
    t1, t2 = int(s1.t), int(s2.t)
    assert t2 > t1
    cols = np.asarray(s2.out_ids)[0, :, t1:t2]
    pat = np.asarray(s2.pattern_ext)[0, :, t1:t2]
    assert np.all((cols == PAD) | (pat != -1))


# --------------------------------------------------------------------------
def test_pipeline_speculative_route(setup):
    """Pipeline wiring: speculative path returns the standard output tuple
    and records stats; greedy pipeline output equals the plain pipeline."""
    from parler_tts_tpu.codec.registry import build_codec, init_codec_params
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

    model, params = setup
    dac = build_codec(CFG.audio_encoder)
    dac_params = init_codec_params(dac, CFG.audio_encoder, jax.random.key(0))
    gen = _gen_cfg(do_sample=False)
    plain = ParlerTTSPipeline(model, params, dac, dac_params, gen)
    spec = ParlerTTSPipeline(
        model, params, dac, dac_params, gen, speculative_window=4
    )
    d, dm, p, pm = _inputs(seed=6)
    a = plain.generate_codes(d, dm, p, pm, seed=0)
    s = spec.generate_codes(d, dm, p, pm, seed=0)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    assert spec.last_spec_stats is not None
    assert int(spec.last_spec_stats.forwards) >= 1

    # per-row batched-serving route: same wiring, still greedy-identical
    pr = ParlerTTSPipeline(
        model, params, dac, dac_params, gen,
        speculative_window=4, speculative_per_row=True,
    )
    d2, dm2, p2, pm2 = _inputs(seed=6, b=3)
    a2 = plain.generate_codes(d2, dm2, p2, pm2, seed=0)
    s2 = pr.generate_codes(d2, dm2, p2, pm2, seed=0)
    np.testing.assert_array_equal(np.asarray(a2.codes), np.asarray(s2.codes))
    assert pr.last_spec_stats is not None


# --------------------------------------------------------------------------
def test_spec_stream_greedy_token_identical(setup):
    """Speculative STREAMING: chunk steps advance >= n_steps columns per call
    and the finalized tokens are identical to the offline AR greedy loop."""
    from parler_tts_tpu.runtime.speculative import (
        make_stream_functions_speculative,
    )

    model, params = setup
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(model, gen)
    inp = _inputs(seed=9)
    off = ar(params, *inp, jax.random.key(3))

    prefill_fn, step_fn = make_stream_functions_speculative(model, gen, window=4)
    state = prefill_fn(params, *inp, jax.random.key(3))
    t_prev = int(state.t)
    while int(state.t) < gen.max_length and not bool(jnp.all(state.eos.eos_seen)):
        state = step_fn(params, state, 5)
        assert int(state.t) >= min(t_prev + 5, gen.max_length) or bool(
            jnp.all(state.eos.eos_seen)
        )
        t_prev = int(state.t)
    t = int(state.t)
    np.testing.assert_array_equal(
        np.asarray(state.out_ids[:, :, :t]),
        np.asarray(off.delayed_ids[:, :, :t]),
    )
    # fewer forwards than columns: speculation actually engaged
    assert int(state.n_fwd) < t - 2


def test_pipeline_spec_stream_matches_plain_stream(setup):
    """Pipeline stream() with speculative_window, greedy.

    The pipeline clamps the visible column count to the play_steps grid
    (speculative chunk steps overshoot by up to W-1 columns), so flush
    boundaries — and therefore decode windows — are IDENTICAL to plain
    streaming: greedy audio must match bit-for-bit, chunk for chunk."""
    from parler_tts_tpu.codec.registry import build_codec, init_codec_params
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

    model, params = setup
    dac = build_codec(CFG.audio_encoder)
    dac_params = init_codec_params(dac, CFG.audio_encoder, jax.random.key(0))
    # codebook_guard keeps random-weight frames codec-valid so the stream
    # actually yields audio; min_new_tokens guarantees several chunks
    gen = _gen_cfg(do_sample=False, max_length=20, min_new_tokens=12,
                   codebook_guard=PAD)
    plain = ParlerTTSPipeline(model, params, dac, dac_params, gen)
    spec = ParlerTTSPipeline(
        model, params, dac, dac_params, gen, speculative_window=4
    )
    d, dm, p, pm = _inputs(seed=10)

    # single flush (play_steps >= max_length)
    a1 = np.concatenate(
        [c for c in plain.stream(d, dm, p, pm, play_steps=24, seed=0)], axis=1
    )
    s1 = np.concatenate(
        [c for c in spec.stream(d, dm, p, pm, play_steps=24, seed=0)], axis=1
    )
    np.testing.assert_array_equal(a1, s1)

    # chunked: identical chunk shapes AND samples (grid-aligned flushes)
    a_chunks = [c for c in plain.stream(d, dm, p, pm, play_steps=6, seed=0)]
    s_chunks = [c for c in spec.stream(d, dm, p, pm, play_steps=6, seed=0)]
    assert len(s_chunks) == len(a_chunks) > 1
    for ac, sc in zip(a_chunks, s_chunks):
        np.testing.assert_array_equal(ac, sc)


# --------------------------------------------------------------------------
@pytest.mark.parametrize(
    "variant",
    ["prompt_cross_attention", "rope", "sliding_window"],
)
def test_greedy_identical_config_variants(variant):
    """Greedy token-identity holds across the decoder's config surface:
    prompt-through-cross-attention (empty decoder prefix, s_p=0), RoPE
    positions, and the sliding-window cache option."""
    import dataclasses

    dec_kw, top_kw, gen_kw = {}, {}, {}
    if variant == "rope":
        dec_kw = dict(rope_embeddings=True)
    elif variant == "sliding_window":
        dec_kw = dict(sliding_window=6)
        gen_kw = dict(cache_implementation="sliding_window")
    else:
        top_kw = dict(prompt_cross_attention=True)
    cfg = dataclasses.replace(
        CFG, decoder=dataclasses.replace(CFG.decoder, **dec_kw), **top_kw
    )
    model = ParlerTTS(cfg)
    params = model.init(
        jax.random.key(4),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), jnp.int32),
        jnp.zeros((1, 2, 3), jnp.int32),
    )["params"]
    gen = _gen_cfg(do_sample=False, **gen_kw)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4)
    inp = _inputs(seed=11)
    a = ar(params, *inp, jax.random.key(1))
    s, _ = sp(params, *inp, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


def test_decoder_only_speculative_greedy_identical(setup):
    """Decoder-only speculative generate (ParlerTTSForCausalLM parity surface)
    is token-identical to the plain decoder-only loop, with and without
    precomputed encoder states / audio-prompt codes."""
    import functools

    from parler_tts_tpu.runtime.generate import generate_tokens_decoder_only
    from parler_tts_tpu.runtime.speculative import (
        generate_tokens_decoder_only_speculative,
    )

    model, params = setup
    gen = _gen_cfg(do_sample=False, min_new_tokens=3)
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.normal(size=(1, 5, CFG.decoder.hidden_size)), jnp.float32)
    enc_mask = jnp.ones((1, 5), jnp.int32)
    codes0 = jnp.asarray(rng.integers(0, PAD, size=(1, 3, 2)), jnp.int32)

    ar = jax.jit(functools.partial(
        generate_tokens_decoder_only, model, gen, batch_size=1))
    sp = jax.jit(functools.partial(
        generate_tokens_decoder_only_speculative, model, gen, batch_size=1,
        window=4))
    for kwargs in (
        {},
        {"encoder_hidden_states": enc, "encoder_mask": enc_mask},
        {"decoder_prompt_codes": codes0},
    ):
        a = ar(params, jax.random.key(5), **kwargs)
        s, stats = sp(params, jax.random.key(5), **kwargs)
        np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
        np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))
        assert int(stats.forwards) >= 1


# --------------------------------------------------------------------------
def test_per_row_greedy_identical_batched(setup):
    """Per-row window advance (each batch row at its own column pointer, with
    per-row KV write offsets): still token-identical to the AR loop per row,
    including rows that finish early and freeze."""
    model, params = setup
    ar = make_generate(model, _gen_cfg(do_sample=False))
    for mnt, seed in ((4, 2), (0, 9)):
        gen = _gen_cfg(do_sample=False, min_new_tokens=mnt)
        ar = make_generate(model, gen)
        sp = make_generate_speculative(model, gen, window=3, per_row=True)
        inp = _inputs(b=3, seed=seed)
        a = ar(params, *inp, jax.random.key(0))
        s, stats = sp(params, *inp, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
        np.testing.assert_array_equal(
            np.asarray(a.lengths), np.asarray(s.lengths)
        )
        np.testing.assert_array_equal(
            np.asarray(a.delayed_ids), np.asarray(s.delayed_ids)
        )
        assert int(stats.forwards) >= 1


def test_per_row_greedy_voice_steering(setup):
    model, params = setup
    gen = _gen_cfg(do_sample=False, min_new_tokens=2)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4, per_row=True)
    inp = _inputs(b=2, seed=5, left_pad=1)
    codes0 = jnp.asarray(
        np.random.default_rng(1).integers(0, PAD, size=(2, 3, 3)), jnp.int32
    )
    a = ar(params, *inp, jax.random.key(0), codes0)
    s, _ = sp(params, *inp, jax.random.key(0), codes0)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


def test_per_row_acceptance_beats_shared_horizon(setup):
    """The point of per-row advance: at B > 1 the per-row accepted-columns
    rate stays at the B=1 rate instead of decaying to the batch minimum."""
    model, params = setup
    gen = _gen_cfg(max_length=20, min_new_tokens=3, do_sample=True)
    b = 6
    inp1 = _inputs(b=1, seed=3)
    rep = lambda x: jnp.repeat(x, b, axis=0)  # noqa: E731
    inp = tuple(rep(x) for x in inp1)

    sp1 = make_generate_speculative(model, gen, window=4)
    _, st1 = sp1(params, *inp1, jax.random.key(11))
    rate_b1 = int(st1.columns) / max(1, int(st1.forwards))

    sh = make_generate_speculative(model, gen, window=4)
    _, st_sh = sh(params, *inp, jax.random.key(12))
    rate_shared = int(st_sh.columns) / max(1, int(st_sh.forwards))

    pr = make_generate_speculative(model, gen, window=4, per_row=True)
    out_pr, st_pr = pr(params, *inp, jax.random.key(13))
    # per-row stats: columns is summed over rows
    rate_pr = int(st_pr.columns) / max(1, int(st_pr.forwards)) / b

    assert rate_pr > rate_shared + 0.2, (rate_pr, rate_shared, rate_b1)
    # and close to the B=1 rate (same inputs replicated; sampling noise only)
    assert rate_pr > 0.6 * rate_b1, (rate_pr, rate_b1)


def test_per_row_stream_token_prefix_identical(setup):
    """Per-row speculative STREAMING state machine: after every chunk step,
    each row's finalized prefix out_ids[i, :, :t_i] must equal the offline AR
    greedy tokens (columns beyond t_i hold unverified candidates and are
    excluded), and every active row advances by >= n_steps per chunk call."""
    from parler_tts_tpu.runtime.speculative import (
        make_stream_functions_speculative,
    )

    model, params = setup
    gen = _gen_cfg(do_sample=False, min_new_tokens=2)
    ar = make_generate(model, gen)
    inp = _inputs(seed=9, b=3)
    off = np.asarray(ar(params, *inp, jax.random.key(3)).delayed_ids)

    prefill_fn, step_fn = make_stream_functions_speculative(
        model, gen, window=4, per_row=True
    )
    state = prefill_fn(params, *inp, jax.random.key(3))
    assert np.asarray(state.t).shape == (3,)
    for _ in range(32):
        t_prev = np.asarray(state.t)
        eos_prev = np.asarray(jnp.all(state.eos.eos_seen, axis=1))
        if bool(((t_prev >= gen.max_length) | eos_prev).all()):
            break
        state = step_fn(params, state, 5)
        t_now = np.asarray(state.t)
        eos_now = np.asarray(jnp.all(state.eos.eos_seen, axis=1))
        # each previously-active row reached its target or finished
        active = ~eos_prev & (t_prev < gen.max_length)
        ok = (t_now >= np.minimum(t_prev + 5, gen.max_length)) | eos_now
        assert ok[active].all(), (t_prev, t_now, eos_now)
        # frozen rows never move
        assert (t_now[~active] == t_prev[~active]).all()
        out = np.asarray(state.out_ids)
        for i in range(3):
            ti = int(t_now[i])
            np.testing.assert_array_equal(out[i, :, :ti], off[i, :, :ti])
    else:
        raise AssertionError("stream did not finish")


def test_per_row_sampled_distribution_preserved(setup):
    """Marginal distributions under per-row advance match AR sampling."""
    model, params = setup
    gen = _gen_cfg(max_length=12, min_new_tokens=3, do_sample=True)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=4, per_row=True)
    b = 512
    d, dm, p, pm = _inputs(seed=3)
    rep = lambda x: jnp.repeat(x, b, axis=0)  # noqa: E731
    inp = (rep(d), rep(dm), rep(p), rep(pm))
    v = CFG.decoder.vocab_size

    a1 = np.asarray(ar(params, *inp, jax.random.key(11)).delayed_ids)
    a2 = np.asarray(ar(params, *inp, jax.random.key(12)).delayed_ids)
    s1 = np.asarray(sp(params, *inp, jax.random.key(13))[0].delayed_ids)

    m_a1, m_a2, m_s = _marginals(a1, v), _marginals(a2, v), _marginals(s1, v)
    tv_noise = 0.5 * np.abs(m_a1 - m_a2).sum(-1)
    tv_spec = 0.5 * np.abs(m_a1 - m_s).sum(-1)
    bound = tv_noise.mean() + 3.0 * np.sqrt(v / (4 * b))
    assert tv_spec.mean() < bound, (tv_spec.mean(), tv_noise.mean(), bound)
    assert tv_spec.max() < tv_noise.max() + 5 * np.sqrt(v / (4 * b))


# --------------------------------------------------------------------------
def test_history_lookup_window_periodic():
    """Unit: the lookup proposes the continuation of the latest suffix match."""
    from parler_tts_tpu.runtime.speculative import history_lookup_window

    k_cb, w, g, L = 3, 4, 2, 32
    period = 5
    base = np.arange(period * k_cb).reshape(period, k_cb) % 11
    hist = np.tile(base, (L // period + 1, 1))[:L].T[None]     # (1, K, L)
    out_ids = jnp.asarray(hist.astype(np.int32))
    t, n = jnp.asarray(16), jnp.asarray(2)                     # t_new = 18
    # stored_f repeats what is already at columns [16, 20): matching state
    stored_f = jnp.moveaxis(out_ids[:, :, 16:16 + w], 2, 0)    # (W, 1, K)
    fallback = jnp.full((w, 1, k_cb), -7, jnp.int32)
    cand = history_lookup_window(
        out_ids, stored_f, t, n, fallback, g_n=g, w=w, k_cb=k_cb)
    # latest match of columns [16, 18) before t_new is at p = 18 - period = 13;
    # its continuation equals the true periodic continuation at [18, 22)
    np.testing.assert_array_equal(
        np.asarray(cand), np.asarray(jnp.moveaxis(out_ids[:, :, 13:13 + w], 2, 0)))
    # per-row variant with per-row pointers
    out2 = jnp.concatenate([out_ids, out_ids], axis=0)         # (2, K, L)
    t2, n2 = jnp.asarray([16, 11]), jnp.asarray([2, 1])
    stored2 = jnp.concatenate(
        [stored_f, jnp.moveaxis(out2[1:2, :, 11:11 + w], 2, 0)], axis=1)
    fb2 = jnp.full((w, 2, k_cb), -7, jnp.int32)
    cand2 = history_lookup_window(
        out2, stored2, t2, n2, fb2, g_n=g, w=w, k_cb=k_cb, per_row=True)
    np.testing.assert_array_equal(np.asarray(cand2[:, 0]), np.asarray(cand[:, 0]))
    np.testing.assert_array_equal(  # row 1: t_new=12, latest match at p=7
        np.asarray(cand2[:, 1]),
        np.asarray(jnp.moveaxis(out2[1, :, 7:7 + w], 1, 0)))


def test_history_lookup_no_match_falls_back():
    from parler_tts_tpu.runtime.speculative import history_lookup_window

    k_cb, w, g, L = 2, 3, 3, 20
    rng = np.random.default_rng(0)
    # injective column ids -> no repeated g-gram anywhere
    hist = (np.arange(L)[None, None, :] * 10
            + np.arange(k_cb)[None, :, None]).astype(np.int32)
    out_ids = jnp.asarray(hist)
    stored_f = jnp.moveaxis(out_ids[:, :, 10:10 + w], 2, 0)
    fallback = jnp.asarray(rng.integers(0, 5, (w, 1, k_cb)).astype(np.int32))
    cand = history_lookup_window(
        out_ids, stored_f, jnp.asarray(10), jnp.asarray(1), fallback,
        g_n=g, w=w, k_cb=k_cb)
    np.testing.assert_array_equal(np.asarray(cand), np.asarray(fallback))
    # early columns (t_new < g): must also fall back, never crash
    cand2 = history_lookup_window(
        out_ids, stored_f, jnp.asarray(1), jnp.asarray(1), fallback,
        g_n=g, w=w, k_cb=k_cb)
    np.testing.assert_array_equal(np.asarray(cand2), np.asarray(fallback))


@pytest.mark.parametrize("lookup", [0, 2, 3])
def test_greedy_identical_with_lookup(setup, lookup):
    """Greedy output is token-identical to the AR loop for every draft
    source — lookup drafts change acceptance, never tokens."""
    model, params = setup
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(model, gen, window=5, lookup_ngram=lookup)
    inp = _inputs(b=2, seed=11)
    a = ar(params, *inp, jax.random.key(7))
    s, stats = sp(params, *inp, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


@pytest.mark.parametrize("lookup", [0, 3])
def test_per_row_greedy_identical_with_lookup(setup, lookup):
    model, params = setup
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(model, gen)
    sp = make_generate_speculative(
        model, gen, window=5, per_row=True, lookup_ngram=lookup)
    inp = _inputs(b=3, seed=4)
    a = ar(params, *inp, jax.random.key(7))
    s, stats = sp(params, *inp, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))


def test_speculative_accept_delta_proposal_exact():
    """The delta (one-hot) proposal used by sampled-mode lookup drafts:
    final ~ p exactly; acceptance rate = p(proposed token)."""
    v, n = 8, 200_000
    rng = np.random.default_rng(1)
    p = rng.dirichlet(np.full(v, 0.5))
    tok = int(np.argmax(p))
    q = np.zeros(v)
    q[tok] = 1.0
    key = jax.random.key(9)
    _, ku, kg = jax.random.split(key, 3)
    cand = jnp.full((n,), tok, jnp.int32)
    u = jax.random.uniform(ku, (n,))
    g = jax.random.gumbel(kg, (n, v))
    final, acc = speculative_accept(
        jnp.broadcast_to(jnp.asarray(p), (n, v)),
        jnp.broadcast_to(jnp.asarray(q), (n, v)),
        cand, u, g,
    )
    emp = np.bincount(np.asarray(final), minlength=v) / n
    np.testing.assert_allclose(emp, p, atol=5e-3)
    assert abs(float(jnp.mean(acc)) - p[tok]) < 5e-3


# --------------------------------------------------------------------------
# speculation x flash-decode composition: the W-column window forward runs
# through the Pallas decode kernel (flat cache, per-column causal limits)
# and must stay token-identical to the AR loop / dense spec path.
@pytest.mark.parametrize("per_row", [False, True])
def test_flash_spec_greedy_token_identical(setup, per_row):
    _, params = setup
    model_flash = ParlerTTS(CFG, use_flash_decode=True)
    gen = _gen_cfg(do_sample=False)
    ar = make_generate(ParlerTTS(CFG), gen)
    sp = make_generate_speculative(
        model_flash, gen, window=4, per_row=per_row
    )
    inp = _inputs(b=2, seed=3, left_pad=1)  # left pad exercises flash starts
    a = ar(params, *inp, jax.random.key(7))
    s, stats = sp(params, *inp, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))
    np.testing.assert_array_equal(
        np.asarray(a.delayed_ids), np.asarray(s.delayed_ids)
    )
    assert int(stats.forwards) >= 1


def test_flash_spec_voice_steering(setup):
    _, params = setup
    model_flash = ParlerTTS(CFG, use_flash_decode=True)
    gen = _gen_cfg(do_sample=False, min_new_tokens=2)
    ar = make_generate(ParlerTTS(CFG), gen)
    sp = make_generate_speculative(model_flash, gen, window=3, per_row=True)
    inp = _inputs(seed=5, left_pad=2)
    codes0 = jnp.asarray(
        np.random.default_rng(1).integers(0, PAD, size=(1, 3, 3)), jnp.int32
    )
    a = ar(params, *inp, jax.random.key(0), codes0)
    s, _ = sp(params, *inp, jax.random.key(0), codes0)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(s.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(s.lengths))

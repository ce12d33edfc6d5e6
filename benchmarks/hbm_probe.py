"""HBM streaming-rate probes: Pallas DMA shape/dtype matrix, XLA int8
convert->dot fusion, int8 MXU matvec. One line per probe; informs the
serving-mode choice in INFERENCE.md. Run alone on the chip; exits cleanly."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 30


def dma_probe(name, dtype, rows, cols, n_chunks):
    """Stream n_chunks blocks of (rows, cols) dtype from HBM, double-buffered."""
    W = jnp.asarray(
        np.random.randint(-3, 3, (n_chunks, rows, cols)).astype(dtype)
    )
    mb = W.size * W.dtype.itemsize / 1e6

    def kernel(w_hbm, o_ref, buf, sem):
        r = pl.program_id(0)
        c = pl.program_id(1)
        n = pl.num_programs(1)
        dma = lambda i, s: pltpu.make_async_copy(w_hbm.at[i], buf.at[s], sem.at[s])
        @pl.when((c == 0) & (r == 0))
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        @pl.when(c == 0)
        def _():
            dma(0, 0).start()
            if n > 1:
                dma(1, 1).start()
        dma(c, c % 2).wait()
        nxt = c + 2
        @pl.when(nxt < n)
        def _():
            dma(nxt, nxt % 2).start()
        o_ref[...] += jnp.sum(buf[c % 2, :1, :128].astype(jnp.float32))[None, None]

    @jax.jit
    def run(w):
        return pl.pallas_call(
            kernel,
            grid=(REPS, n_chunks),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, rows, cols), W.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(w)

    np.asarray(run(W))
    t0 = time.perf_counter(); np.asarray(run(W)); dt = (time.perf_counter() - t0) / REPS
    print(f"[dma {name}] {dt*1e3:.3f} ms -> {mb/1e3/dt:.0f} GB/s", flush=True)


# 336MB total each, 2MB chunks, varying shape/dtype
dma_probe("int8 minor=128 ", np.int8, 16384, 128, 168)
dma_probe("int8 minor=2048", np.int8, 1024, 2048, 168)
dma_probe("int8 minor=8192", np.int8, 256, 8192, 168)
dma_probe("bf16 minor=128 ", jnp.bfloat16, 8192, 128, 168)
dma_probe("bf16 minor=2048", jnp.bfloat16, 512, 2048, 168)
dma_probe("int8 8MB chunks", np.int8, 1024, 8192, 42)

# ---- XLA paths
K, Nw = 8192, 16384
N = 100
sc = jnp.asarray(np.random.rand(Nw), jnp.float32)
x = jnp.asarray(np.random.randn(1, K), jnp.bfloat16)
w8 = jnp.asarray(np.random.randint(-127, 127, (K, Nw), np.int8))


def timed(name, f, mb):
    np.asarray(f())
    t0 = time.perf_counter(); np.asarray(f()); dt = (time.perf_counter() - t0) / N
    print(f"[xla {name}] {dt*1e3:.3f} ms/iter -> {mb/1e3/dt:.0f} GB/s", flush=True)


@jax.jit
def conv_loop():
    def body(i, acc):
        y = jnp.dot(acc, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        y = y * (sc[None, :] + i * 0.0)
        return y[:, :K].astype(jnp.bfloat16) * 1e-3
    return jax.lax.fori_loop(0, N, body, x)


@jax.jit
def mxu_loop():
    def body(i, acc):
        amax = jnp.max(jnp.abs(acc), axis=-1, keepdims=True).astype(jnp.float32) + 1e-8
        x8 = jnp.round(acc.astype(jnp.float32) / amax * 127.0).astype(jnp.int8)
        y = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (amax / 127.0) * sc[None, :] * (1.0 + i * 0.0)
        return y[:, :K].astype(jnp.bfloat16) * 1e-3
    return jax.lax.fori_loop(0, N, body, x)


@jax.jit
def int8_sum_loop():
    # XLA's own streaming rate over int8 data (no pallas): chunked reduce
    def body(i, acc):
        blk = jax.lax.dynamic_slice(w8, (0, 0), (K, 2048))
        return acc + jnp.sum(blk.astype(jnp.int32)) * (i * 0 + 1)
    return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.int32))


timed("int8 conv->dot", conv_loop, w8.size / 1e6)
timed("int8 MXU dot  ", mxu_loop, w8.size / 1e6)
print("done", flush=True)

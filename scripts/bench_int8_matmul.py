"""int8 vs bf16 dot_general on the ViT-L trunk shapes (v5e).

v5e MXU int8 peak is 2x bf16 (394 vs 197 TOP/s). The r2 note recorded
"int8 only 1.3x bf16" without shapes; before building a quantized serving
mode, re-measure on the shapes that actually dominate an encode step
(M = B64 audio rows = 64*(512+1) -> padded 16448):

  qkv   [M,1024] @ [1024,3072]
  out   [M,1024] @ [1024,1024]
  fc    [M,1024] @ [1024,4096]
  proj  [M,4096] @ [4096,1024]

Also times the full quantize->int8-dot->dequant chain (dynamic per-row
activation scales + per-col weight scales), which is what a serving path
would actually run — the quant/dequant elementwise work eats into the 2x.

In-jit scan timing per repo rules (single-dispatch timings are tunnel
garbage; fence with np.asarray).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M = 16448
SHAPES = {
    "qkv": (M, 1024, 3072),
    "out": (M, 1024, 1024),
    "fc": (M, 1024, 4096),
    "proj": (M, 4096, 1024),
}
ITERS = 100


def timed(fn, x):
    """fn(x) -> [m, n]; iterations chain through a tiny data-dependent
    perturbation of the activation so XLA can't hoist the matmul."""
    k = x.shape[1]
    isint = jnp.issubdtype(x.dtype, jnp.integer)

    def body(c, _):
        o = fn(c)
        # column reduction over ALL rows: a row-slice here lets XLA DCE the
        # [M]-row matmul down to one row (measured >chip-peak "TF/s")
        col = jnp.sum(o, axis=0, keepdims=True, dtype=jnp.float32)
        col = col[:, :min(k, o.shape[1])]
        if col.shape[1] < k:  # n < k: tile up to the carry width
            col = jnp.concatenate([col] * (k // col.shape[1]), axis=1)
        pert = jnp.sign(col).astype(c.dtype)
        if not isint:
            pert = pert * jnp.asarray(1e-6, c.dtype)
        return c + pert, None

    @jax.jit
    def loop(x0):
        c, _ = jax.lax.scan(body, x0, None, length=ITERS)
        # scalar result: fetching the full [M,K] carry through the ~46 MB/s
        # tunnel costs ~7 ms/iter amortized and swamps the matmul
        return c[0, 0]

    r = loop(x)
    np.asarray(r)
    t0 = time.time()
    r = loop(x)
    np.asarray(r)
    return (time.time() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    for name, (m, k, n) in SHAPES.items():
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
        wscale = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)

        t_bf16 = timed(lambda a: a @ w, x)

        def int8_dot(a):
            return jax.lax.dot_general(
                a, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t_int8 = timed(int8_dot, xi)

        # the real serving chain: bf16 act -> dynamic per-row scale ->
        # int8 -> dot -> dequant (row x col scales) -> bf16
        def chain(a):
            s = jnp.max(jnp.abs(a), axis=1, keepdims=True).astype(
                jnp.float32) / 127.0
            ai = jnp.clip(jnp.round(a.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                ai, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s * wscale[None, :]).astype(
                jnp.bfloat16)

        t_chain = timed(chain, x)

        fl = 2 * m * k * n
        print(f"{name:5s} [{m}x{k}x{n}] bf16 {t_bf16*1e3:7.3f} ms "
              f"({fl/t_bf16/1e12:6.1f} TF/s) | int8-dot {t_int8*1e3:7.3f} "
              f"({fl/t_int8/1e12:6.1f}) x{t_bf16/t_int8:4.2f} | "
              f"chain {t_chain*1e3:7.3f} ({fl/t_chain/1e12:6.1f}) "
              f"x{t_bf16/t_chain:4.2f}")


if __name__ == "__main__":
    main()

"""Round-4 backward decomposition: is the train step's bwd (~66 TF/s vs the
fwd's ~96) losing to XLA dgrad matmul layouts, or is it structural?

Probes (all differential: N_hi vs N_lo dependent iterations in ONE jitted
program — per-dispatch timing through the tunnel is RPC, not compute):

  lin_fwd     isolated per-layer linear chain (qkvo + GEGLU FFN) at train
              shapes (m = b*t = 6912 rows, d=1280), forward only
  lin_train   same chain under value_and_grad wrt weights AND input
              (the real training contraction set: dgrad + wgrad)
  lin_dgrad   grad wrt input only (dy @ W^T chain)   - isolates dgrad
  lin_wgrad   grad wrt weights only (x^T @ dy set)   - isolates wgrad
  lin_pret    custom_vjp chain whose dgrad uses PRE-TRANSPOSED weight
              copies (dx = dy @ Wt with Wt stored) — the upper bound on
              any dgrad-layout win XLA could give us
  attn        attention core fwd and fwd+bwd (the production Pallas
              kernels via modules.transformer.dot_product_attention path)
              at train shapes, reported as achieved padded TF/s vs the
              d->128-padded MXU floor

Run: MODE=all python scratch/bench_bwd_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

B, T, D, H = 8, 864, 1280, 20
DH = D // H  # 64
FF = 4 * D  # GEGLU inner width (factor-2 gate -> w_1 out is 2*FF)
M = B * T
ITERS_LO, ITERS_HI = 2, 22
DT = jnp.bfloat16


def _wall(fn, iters, n=3):
    np.asarray(fn(iters))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(iters))
        best = min(best, time.perf_counter() - t0)
    return best


def _diff_ms(fn):
    lo, hi = _wall(fn, ITERS_LO), _wall(fn, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def _report(name, ms, flops):
    tfs = flops / (ms * 1e-3) / 1e12
    print(f"[{name}] {ms:.3f} ms  -> {tfs:.1f} TF/s")
    return tfs


# per-"layer" linear chain FLOPs (fwd): qkvo 4x (M,D)@(D,D), w1 (M,D)@(D,2FF),
# w2 (M,FF)@(FF,D)
FWD_FLOPS = 2 * M * D * (4 * D + 2 * FF) + 2 * M * FF * D


def _weights(key):
    ks = jax.random.split(key, 6)
    scale = 0.02
    return dict(
        wq=jax.random.normal(ks[0], (D, D), DT) * scale,
        wk=jax.random.normal(ks[1], (D, D), DT) * scale,
        wv=jax.random.normal(ks[2], (D, D), DT) * scale,
        wo=jax.random.normal(ks[3], (D, D), DT) * scale,
        w1=jax.random.normal(ks[4], (D, 2 * FF), DT) * scale,
        w2=jax.random.normal(ks[5], (FF, D), DT) * scale,
    )


def _chain(w, x):
    # the per-layer matmul set with attention replaced by a cheap
    # elementwise mix. The mix must use q/k/v NONLINEARLY and distinctly:
    # a plain q+k+v lets XLA's DotMerger collapse the three projections
    # into one matmul against (wq+wk+wv) (first probe run read >200 TF/s —
    # above peak — from exactly that).
    q = x @ w["wq"]
    k = x @ w["wk"]
    v = x @ w["wv"]
    a = (q * jax.nn.sigmoid(k) + v) @ w["wo"]
    h = a @ w["w1"]
    gate, val = jnp.split(h, 2, axis=-1)
    h = jax.nn.gelu(gate) * val
    return h @ w["w2"]


def _chain_pret(w, wt, x):
    """Same chain, but every matmul's dgrad uses a stored transposed copy."""

    @jax.custom_vjp
    def lin(x, W, Wt):
        return x @ W

    def lin_fwd(x, W, Wt):
        return x @ W, (x, Wt)

    def lin_bwd(res, dy):
        x, Wt = res
        dx = dy @ Wt  # no transpose at bwd time
        dW = jax.lax.dot_general(
            x, dy, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return dx, dW, jnp.zeros_like(Wt)

    lin.defvjp(lin_fwd, lin_bwd)
    q = lin(x, w["wq"], wt["wq"])
    k = lin(x, w["wk"], wt["wk"])
    v = lin(x, w["wv"], wt["wv"])
    a = lin(q * jax.nn.sigmoid(k) + v, w["wo"], wt["wo"])
    h = lin(a, w["w1"], wt["w1"])
    gate, val = jnp.split(h, 2, axis=-1)
    h = jax.nn.gelu(gate) * val
    return lin(h, w["w2"], wt["w2"])


def probe_linears():
    w = _weights(jax.random.PRNGKey(0))
    wt = {k: jnp.swapaxes(v, 0, 1) for k, v in w.items()}
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, D), DT)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def fwd_loop(w, x, iters):
        def body(i, x):
            return _chain(w, x) + x  # dependent chain

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

    def make_grad_loop(wrt):
        def loss(w, x):
            # SQUARED loss: dy = chain(w, x), a full-rank, x-dependent
            # cotangent. With loss=sum(y), dy=ones makes every dy@W^T
            # rank-1 (XLA computes column sums, not matmuls) and the rest
            # loop-invariant — the first probe runs read >300 TF/s from
            # exactly that degeneracy.
            y = _chain(w, x).astype(jnp.float32)
            return 0.5 * jnp.sum(y * y)

        if wrt == "both":
            g = jax.grad(loss, argnums=(0, 1))
        elif wrt == "w":
            g = jax.grad(loss, argnums=0)
        else:
            g = jax.grad(loss, argnums=1)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(w, x, iters):
            def body(i, x):
                gr = g(w, x)
                leaves = jax.tree_util.tree_leaves(gr)
                # fold the grads back into x so the bwd is not DCE'd
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return x + (s * 1e-30).astype(x.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32)
            )

        return loop

    @functools.partial(jax.jit, static_argnames=("iters",))
    def pret_loop(w, wt, x, iters):
        def loss(w, x):
            y = _chain_pret(w, wt, x).astype(jnp.float32)
            return 0.5 * jnp.sum(y * y)

        g = jax.grad(loss, argnums=(0, 1))

        def body(i, x):
            gr = g(w, x)
            leaves = jax.tree_util.tree_leaves(gr)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x + (s * 1e-30).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

    ms = _diff_ms(lambda it: fwd_loop(w, x0, it))
    _report("lin_fwd (1x fwd flops)", ms, FWD_FLOPS)

    ms = _diff_ms(lambda it: make_grad_loop("both")(w, x0, it))
    _report("lin_train (3x fwd flops)", ms, 3 * FWD_FLOPS)

    ms = _diff_ms(lambda it: make_grad_loop("x")(w, x0, it))
    _report("lin_dgrad (2x fwd flops)", ms, 2 * FWD_FLOPS)

    ms = _diff_ms(lambda it: make_grad_loop("w")(w, x0, it))
    _report("lin_wgrad (2x fwd flops)", ms, 2 * FWD_FLOPS)

    ms = _diff_ms(lambda it: pret_loop(w, wt, x0, it))
    _report("lin_pret (3x fwd flops)", ms, 3 * FWD_FLOPS)


def probe_attention():
    from vampnet_tpu.ops.flash_attention import flash_attention_with_bias

    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, DH), DT)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, DH), DT)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, DH), DT)
    bias = jax.random.normal(jax.random.PRNGKey(3), (H, T, T), jnp.float32)

    tp = ((T + 127) // 128) * 128
    d_pad = 128  # lanes: d=64 pads to 128 on the MXU
    fwd_flops = 2 * 2 * B * H * tp * tp * d_pad  # 2 score matmuls, padded
    bwd_flops = 5 * 2 * B * H * tp * tp * d_pad  # whole-seq bwd: 5 matmuls

    @functools.partial(jax.jit, static_argnames=("iters",))
    def fwd_loop(q, k, v, bias, iters):
        def body(i, q):
            o = flash_attention_with_bias(q, k, v, bias)
            return q + o * 1e-30 + 1e-6  # dependent

        return jnp.sum(
            jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
        )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def train_loop(q, k, v, bias, iters):
        def loss(q, k, v, bias):
            return jnp.sum(
                flash_attention_with_bias(q, k, v, bias).astype(jnp.float32)
            )

        g = jax.grad(loss, argnums=(0, 1, 2, 3))

        def body(i, q):
            dq, dk, dv, db = g(q, k, v, bias)
            s = (
                jnp.sum(dq.astype(jnp.float32))
                + jnp.sum(dk.astype(jnp.float32))
                + jnp.sum(dv.astype(jnp.float32))
                + jnp.sum(db.astype(jnp.float32))
            )
            return q + (s * 1e-30).astype(q.dtype) + 1e-6

        return jnp.sum(
            jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
        )

    ms_f = _diff_ms(lambda it: fwd_loop(q, k, v, bias, it))
    _report("attn_fwd (padded)", ms_f, fwd_flops)
    ms_t = _diff_ms(lambda it: train_loop(q, k, v, bias, it))
    _report("attn_train fwd+bwd (padded)", ms_t, fwd_flops + bwd_flops)
    ms_b = ms_t - ms_f
    _report("attn_bwd alone (padded)", ms_b, bwd_flops)
    print(
        f"  bwd/fwd time ratio {ms_b / ms_f:.2f} (flop ratio 2.50); "
        f"per layer: fwd {ms_f:.2f} ms, bwd {ms_b:.2f} ms"
    )


def main():
    print("backend:", jax.default_backend())
    mode = os.environ.get("MODE", "all")
    if mode in ("all", "lin"):
        probe_linears()
    if mode in ("all", "attn"):
        probe_attention()


if __name__ == "__main__":
    main()

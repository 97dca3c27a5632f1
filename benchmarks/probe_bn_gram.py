"""BN-cost attack probe (round-4 follow-up to probe_towers_anatomy).

Anatomy r4 measured: towers fwd+bwd+Adam 21.9 ms f32, 15.0 ms without BN
(BN ≈ 7 ms), pure-matmul skeleton 7.2 ms, bf16 towers 12.8 ms. This probe
(a) fills in the bf16 corners (skeleton_bf16, nobn_bf16) and (b) measures a
GRAM-trick BN prototype: training-mode batch moments of y = xW + b computed
from the layer INPUT's sufficient statistics instead of a full pass over y —

    mean(y)  = mean(x) @ W + b
    E[ya²]_c = diag(Wᵀ (xᵀx) W)_c / n          (ya = x @ W, pre-bias)
    var(y)   = E[ya²] + 2 b·E[ya] + b² − mean(y)²

The Gram xᵀx costs one extra (R, K)ᵀ(R, K) matmul (MXU, K ≤ 256) but
removes the forward full-tensor moment reductions over the (R, C) output.
Mathematically identical moments (same fast-variance cancellation class as
flax's E[x²]−E[x]² path); backward reductions over the output grad remain.

Raw-jnp tower emulation at exact paper shapes (R = 3·6·512·64 rows), both
towers, relu + masks omitted equally from both arms so ONLY the moment
formulation differs.

    python benchmarks/probe_bn_gram.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


EPS = 1e-3


def bn_direct(y, gamma, beta):
    mu = jnp.mean(y, axis=0)
    var = jnp.mean(y * y, axis=0) - mu * mu
    return gamma * (y - mu) * jax.lax.rsqrt(var + EPS) + beta


def bn_gram(x, W, b, gamma, beta):
    """BN(xW + b) with moments from x's sufficient statistics."""
    n = x.shape[0]
    ya = jnp.dot(x, W, preferred_element_type=jnp.float32)
    s1 = jnp.sum(x, axis=0)                              # (K,)
    gram = jnp.dot(x.T, x, preferred_element_type=jnp.float32)   # (K, K)
    mean_ya = jnp.dot(s1, W) / n                         # (C,)
    e_ya2 = jnp.einsum("kc,kl,lc->c", W, gram, W) / n    # diag(Wᵀ G W)/n
    mu = mean_ya + b
    var = e_ya2 + 2.0 * b * mean_ya + b * b - mu * mu
    return gamma * (ya + b - mu) * jax.lax.rsqrt(var + EPS) + beta


def make_chain(mode, dtype, widths, R, K=8):
    """mode: 'direct' | 'gram' | 'nobn' | 'skeleton'."""
    r = np.random.RandomState(0)
    params = {}
    k_in = 3
    for i, c in enumerate(widths):
        params[f"W{i}"] = jnp.asarray(r.randn(k_in, c).astype(np.float32) * 0.3)
        params[f"b{i}"] = jnp.asarray(r.randn(c).astype(np.float32) * 0.1)
        params[f"g{i}"] = jnp.asarray(1.0 + 0.1 * r.randn(c).astype(np.float32))
        params[f"be{i}"] = jnp.asarray(0.1 * r.randn(c).astype(np.float32))
        k_in = c

    def loss(params, x):
        h = x.astype(dtype)
        for i in range(len(widths)):
            W = params[f"W{i}"].astype(dtype)
            b, g, be = params[f"b{i}"], params[f"g{i}"], params[f"be{i}"]
            if mode == "skeleton":
                h = jnp.dot(h, W, preferred_element_type=jnp.float32).astype(dtype)
            elif mode == "nobn":
                h = jnp.maximum(
                    jnp.dot(h, W, preferred_element_type=jnp.float32) + b,
                    0.0).astype(dtype)
            elif mode == "direct":
                y = jnp.dot(h, W, preferred_element_type=jnp.float32) + b
                h = jnp.maximum(bn_direct(y, g, be), 0.0).astype(dtype)
            else:
                h = jnp.maximum(
                    bn_gram(h.astype(jnp.float32) if dtype != jnp.float32 else h,
                            params[f"W{i}"], b, g, be),
                    0.0).astype(dtype)
        return jnp.sum(h.astype(jnp.float32)) * 1e-6

    def steps(params, x):
        def one(i, carry):
            g = jax.grad(loss)(carry, x * (1.0 + 1e-6 * i))
            return jax.tree.map(lambda w, gg: w - 1e-9 * gg, carry, g)
        out = jax.lax.fori_loop(0, K, one, params)
        return out["W0"]

    return steps, params


def main(reps: int = 5, K: int = 8):
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    R = 3 * 6 * 512 * 64
    widths = (64, 128, 256)       # detector tower; descriptor layers are
                                  # narrower — the detector dominates
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, 3).astype(np.float32))

    bf16 = jnp.bfloat16
    variants = {
        "direct_f32": make_chain("direct", jnp.float32, widths, R, K),
        "gram_f32": make_chain("gram", jnp.float32, widths, R, K),
        "nobn_f32": make_chain("nobn", jnp.float32, widths, R, K),
        "skeleton_f32": make_chain("skeleton", jnp.float32, widths, R, K),
        "direct_bf16": make_chain("direct", bf16, widths, R, K),
        "gram_bf16": make_chain("gram", bf16, widths, R, K),
        "nobn_bf16": make_chain("nobn", bf16, widths, R, K),
        "skeleton_bf16": make_chain("skeleton", bf16, widths, R, K),
    }

    compiled = {}
    for name, (fn, params) in variants.items():
        c = jax.jit(fn).lower(params, x).compile()
        float(np.asarray(c(params, x)).ravel()[0])
        compiled[name] = (c, params)
        print(f"compiled {name}", flush=True)

    # numeric check: gram == direct moments to f32 rounding
    (d_fn, d_p) = variants["direct_f32"]
    (g_fn, g_p) = variants["gram_f32"]
    d_out = np.asarray(jax.jit(d_fn)(d_p, x))
    g_out = np.asarray(jax.jit(g_fn)(g_p, x))
    rel = np.max(np.abs(d_out - g_out) / (np.abs(d_out) + 1e-6))
    print(f"gram-vs-direct post-step W0 max rel diff: {rel:.2e}")

    times = {n: [] for n in variants}
    for rep in range(reps):
        for name, (c, params) in compiled.items():
            t0 = time.time()
            out = c(params, x)
            float(np.asarray(out).ravel()[0])
            times[name].append((time.time() - t0) / K * 1000)

    res = {}
    for name in variants:
        med = float(np.median(times[name]))
        res[name] = round(med, 2)
        print(f"{name:14s} {med:7.2f} ms/step")
    print(json.dumps(res))


if __name__ == "__main__":
    main()

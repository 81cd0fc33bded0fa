"""Isolated benchmark: fused SIR encoder Pallas kernel vs einsum path at
OcOccNet production shape (G=128 RoIs, P=1024 points, 6 blocks, C1=128).

Run on the real chip:  python benchmarks/bench_sir_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from objectcentricocccompletion_tpu.models.sir import SIREncoder

G, P, F, R, NB, C1 = 128, 1024, 8, 13, 6, 128
DT = jnp.bfloat16


def timed(fn, *args, n=30, warm=10):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(G, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(G, P, F).astype(np.float32))
    fc = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.3)

    kw = dict(num_blocks=NB, feat_channels=(C1, C1), rel_mlp_hidden=(16, 32),
              xyz_normalizer=(20.0, 20.0, 4.0), geo_input=True, dtype=DT)
    import os
    variants = [(True, "pallas-fused")] if os.environ.get("ONLY_PALLAS") else [(True, "pallas-fused"), (False, "einsum")]
    for use_pallas, name in variants:
        enc = SIREncoder(**kw, use_pallas=use_pallas)
        v = enc.init(jax.random.PRNGKey(0), xyz, feats, mask, fc)
        params = v["params"]
        w = jnp.asarray(rng.randn(G, NB * 2 * C1).astype(np.float32))

        @jax.jit
        def fwd(p, xyz, feats, fc):
            _, c = enc.apply({"params": p}, xyz, feats, mask, fc)
            return c

        @jax.jit
        def fwdbwd(p, xyz, feats, fc):
            def loss(p_):
                _, c = enc.apply({"params": p_}, xyz, feats, mask, fc)
                return jnp.sum(c.astype(jnp.float32) * w)
            l, g = jax.value_and_grad(loss)(p)
            return l, jax.tree_util.tree_map(lambda x: jnp.sum(x), g)

        t_f = timed(fwd, params, xyz, feats, fc)
        t_fb = timed(fwdbwd, params, xyz, feats, fc)
        # fwd GEMM flops (x3 for train as rough fwd+bwd)
        flops = 0
        cin = 3 + F + R
        for _ in range(NB):
            gate = P * (R * 16 + 16 * 32 + 32 * cin)
            vfe = P * (cin * C1 + 2 * C1 * C1)
            flops += 2 * G * (gate + vfe)
            cin = 3 + C1 + R
        print(f"{name:14s} fwd {t_f:7.2f} ms ({flops/t_f/1e9:6.1f} TF/s)  "
              f"fwd+bwd {t_fb:7.2f} ms ({3*flops/t_fb/1e9:6.1f} TF/s)")


if __name__ == "__main__":
    main()

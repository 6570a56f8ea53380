"""On-chip A/B: stack_grad wall time across tile geometries.

``--filters N`` (default 32 = flagship) sweeps the N-filter topology with
the cfg-derived widths CMID = 8N (exp_rate) and CDEC = int(0.8 N)
(decay_rate) — e.g. 64 for the best-scoring 0.9411 model."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import probav_tpu.ops.pallas_tstack as ts

rng = np.random.default_rng(0)
FILTERS = (int(sys.argv[sys.argv.index("--filters") + 1])
           if "--filters" in sys.argv else 32)
B, H, W, T = 128, 22, 22, 9
C, CMID, CDEC = FILTERS, 8 * FILTERS, int(0.8 * FILTERS)
print(f"filters={C} cmid={CMID} cdec={CDEC}", flush=True)
mk = lambda *s: jnp.asarray(rng.normal(0, 0.3, s), jnp.float32)
blocks = tuple((mk(C, CMID), mk(CMID), mk(CMID, CDEC), mk(CDEC),
                mk(3, 3, 3, CDEC, C), mk(C)) for _ in range(12))
x = jnp.asarray(rng.normal(0, 1, (B, H, W, T, C)), jnp.bfloat16)

configs = [(363, 33), (363, 11), (363, 121), (242, 22),
           (264, 33), (528, 33), (726, 33), (176, 22)]
for rows, ch in configs:
    try:
        fn = jax.jit(lambda a, r=rows, c=ch: jax.tree.map(
            jnp.sum, jax.grad(lambda q: jnp.sum(
                ts.stack_apply_5d(q, blocks, target_rows=r,
                                  target_ch=c) ** 2))(a)))
        t0 = time.time()
        o = fn(x)
        _ = float(jax.tree.leaves(o)[0])
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(x)
        _ = float(jax.tree.leaves(o)[0])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"rows={rows:4d} ch={ch:4d}: {ms:7.2f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"rows={rows:4d} ch={ch:4d}: FAIL {str(e)[:120]}", flush=True)
os._exit(0)

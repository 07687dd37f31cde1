"""Corner-table gather strategies on the real chip (Kirk shear-gather path).

The pallas_shear sweep is ~1.8 ms: ~0.78 ms kernel + ~0.84 ms building the
4 corner tables with element gathers (jnp.take of ~31k indices x 4). This
measures alternatives for the gather half:

  take4   - current: 4 separate takes of T elements        (baseline)
  take1   - one take of the concatenated (4T,) index array
  rows4   - V4 = 4 shifted copies stacked minor -> one row-gather (T, 4)
  gat22   - lax.gather on the 2-D table, slice_sizes=(2,2) -> (T, 2, 2)
  rowsl   - per-lattice-ROW dynamic slices: T rows, each a contiguous
            (1, L)-ish window of a column-sheared V  (structure probe:
            one dynamic_slice per row instead of element gathers)

Each strategy is timed as K=200 chained repetitions inside one jit (result
feeds back through the value table so nothing folds), per-repeat cost
reported. Parity of every strategy vs take4 is asserted on-device first.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.models import kirk
from ocdp_tpu.ops.sheargather import build_sheargather_backup


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = kirk.KirkConfig()
    p = kirk.build(cfg)
    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=20)
    n0, n1 = sg.grid_shape
    t_shape = sg.t_shape
    T = int(np.prod(t_shape))
    print(f"grid {n0}x{n1}, t_shape {t_shape} = {T} lattice pts", flush=True)

    corner_idx = sg.corner_idx                      # (T,) int32 flat
    offs = np.array([0, 1, n1, n1 + 1], np.int32)

    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n0 * n1,), jnp.float32)

    # ---- strategy definitions (each: v_flat -> (4, T) corner stack) ----
    def take4(vf):
        return jnp.stack([jnp.take(vf, corner_idx + int(o)) for o in offs])

    idx_cat = jnp.concatenate([corner_idx + int(o) for o in offs])

    def take1(vf):
        return jnp.take(vf, idx_cat).reshape(4, T)

    # rows4: minor-dim-4 row gather from 4 shifted copies
    vpad_len = n0 * n1 + n1 + 1

    def rows4(vf):
        vp = jnp.pad(vf, (0, n1 + 1))
        v4 = jnp.stack([jax.lax.dynamic_slice(vp, (int(o),), (n0 * n1,))
                        for o in offs], axis=-1)     # (n0*n1, 4)
        return jnp.take(v4, corner_idx, axis=0).T   # (4, T)

    # gat22: 2-D gather with slice_sizes=(2,2)
    starts2d = jnp.stack([corner_idx // n1, corner_idx % n1], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gat22(vf):
        g = jax.lax.gather(vf.reshape(n0, n1), starts2d, dnums,
                           slice_sizes=(2, 2))       # (T, 2, 2)
        g = g.reshape(T, 4).T                        # corner order (c0,c1)
        return g

    strategies = {"take4": take4, "take1": take1, "rows4": rows4,
                  "gat22": gat22}

    ref = jax.jit(take4)(v)
    for name, fn in strategies.items():
        got = jax.jit(fn)(v)
        ok = bool(jnp.all(got == ref))
        print(f"parity {name}: {'OK' if ok else 'MISMATCH'}", flush=True)

    K = 200

    def timed(fn):
        @jax.jit
        def loop(vf):
            def body(carry, _):
                c = fn(carry)
                # feed back so the gather can't fold; cheap reduce
                return carry + 1e-12 * jnp.sum(c), ()
            out, _ = jax.lax.scan(body, vf, None, length=K)
            return out[0]
        fetch(loop(v))                       # compile
        t0 = time.perf_counter()
        fetch(loop(v))
        dt = time.perf_counter() - t0
        return dt / K

    for name, fn in strategies.items():
        per = timed(fn)
        print(f"{name:7s} {per * 1e3:8.4f} ms/rep "
              f"({per / (4 * T) * 1e9:6.2f} ns/element)", flush=True)


if __name__ == "__main__":
    main()

"""Per-sweep cost breakdown of the pallas_shear Kirk backup on the chip.

Times (K-chained, per-rep):
  A) single row-gather corner tables (the current __call__ input path)
  B) A + phase-split/pad views + per-chunk W stack  (all kernel inputs)
  C) full backup __call__
"""

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.models import kirk
from ocdp_tpu.models.kirk import _separable_cost_terms
from ocdp_tpu.ops.pallas_shear import build_pallas_shear_backup


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def timed(fn, v, K=100):
    @jax.jit
    def loop(vf):
        def body(carry, _):
            out = fn(carry)
            return carry + 1e-12 * jnp.sum(out), ()
        out, _ = jax.lax.scan(body, vf, None, length=K)
        return out[0]
    fetch(loop(v))
    t0 = time.perf_counter()
    fetch(loop(v))
    return (time.perf_counter() - t0) / K


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = kirk.KirkConfig()
    p = kirk.build(cfg)
    bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=50,
                                   cost_terms=_separable_cost_terms(cfg))
    n0, n1 = bk.grid_shape
    v = jax.random.normal(jax.random.PRNGKey(0), (n0, n1), jnp.float32)

    u0, u1 = bk.upsample

    def gather(values):
        """The __call__ input path up to the corner tables."""
        v_flat = values.reshape(-1)
        offs = [c0 * n1 + c1 for c0, c1 in itertools.product((0, 1),
                                                             repeat=2)]
        vp = jnp.pad(v_flat, (0, max(offs)))
        v4 = jnp.stack([jax.lax.dynamic_slice(vp, (o,), (v_flat.shape[0],))
                        for o in offs], axis=-1)
        return jnp.take(v4, bk.corner_idx, axis=0)

    def inputs_only(values):
        g = gather(values)
        views = {}
        for ci, corner in enumerate(itertools.product((0, 1), repeat=2)):
            t = g[:, ci].reshape(bk.t_shape)
            for p0 in range(u0):
                for p1 in range(u1):
                    w = t[p0::u0, p1::u1]
                    views[corner + (p0, p1)] = jnp.pad(
                        w, ((0, bk.vr_pad - w.shape[0]),
                            (0, bk.vc_pad - w.shape[1])))
        wins = []
        for ci in range(bk.n_chunks):
            slots = []
            for slot in range(bk.n_slots):
                r0, c0 = bk.win_origin[ci][slot]
                src = views[bk.slot_phase[ci][slot]]
                slots.append(jax.lax.slice(
                    src, (r0, c0), (r0 + bk.R_w, c0 + bk.L_w)))
            wins.append(jnp.stack(slots))
        return jnp.stack(wins)

    def full(values):
        return bk(values).values

    print(f"W shape (C,slots,R,L) = ({bk.n_chunks},{bk.n_slots},"
          f"{bk.R_w},{bk.L_w}) = "
          f"{bk.n_chunks*bk.n_slots*bk.R_w*bk.L_w*4/1e6:.1f} MB", flush=True)
    q_mb = bk.n_chunks * bk.chunk * bk.S0p * bk.S1p * 4 / 1e6
    print(f"query arrays (jj,f0,f1): 3 x {q_mb:.1f} MB; t_cells "
          f"{int(np.prod(bk.t_shape))}", flush=True)

    for name, fn in [("A gather", lambda v_: gather(v_).sum(-1)),
                     ("B inputs", inputs_only),
                     ("C full", full)]:
        per = timed(fn, v)
        print(f"{name:10s} {per*1e3:8.4f} ms/rep", flush=True)


if __name__ == "__main__":
    main()

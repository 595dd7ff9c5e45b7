"""Round-3 v6 validation: bf16 scaled-Plucker conservative tri cull.

Per (bounce ray, triangle): 5 sign tests from ONE matmul row:
  side_e = [d, oxd] . [axb, b-a]   (3 edges, columns unit-scaled)
  pl1    = [o, 1]   . [n, dplane]  (plane side of origin)
  pl2    = [d]      . [n]          (direction vs plane)
forward line hit  = all three side_e same sign (within margin)
                    AND sign(pl1) != sign(pl2)  (t > 0)
Checks vs exact MT over the same pairs: false-negative rate (must be 0
with margin), survivors/lane, item-level (8-tri) survivor stats.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.render.scene import textured_mesh_scene
from scripts.exp_r3_twopass import bounce_rays

def main():
    scene = textured_mesh_scene(256, 256, backend="cluster")
    g = scene.geom
    v0 = np.asarray(g.v0, np.float64); e1 = np.asarray(g.e1, np.float64)
    e2 = np.asarray(g.e2, np.float64)
    a = v0; b = v0 + e1; c = v0 + e2
    T = a.shape[0]
    print("tris:", T)
    n = 4096
    o_b, d_b = bounce_rays(scene, n, 64, 64)
    o = np.asarray(o_b, np.float64); d = np.asarray(d_b, np.float64)

    # exact MT oracle (all pairs)
    def mt_all(o, d):
        pv = np.cross(d[:,None,:], e2[None])
        det = np.einsum('tk,ntk->nt', e1, pv)
        ok = np.abs(det) > 1e-12
        inv = 1.0/np.where(ok, det, 1.0)
        tv = o[:,None,:] - v0[None]
        u = np.einsum('ntk,ntk->nt', tv, pv)*inv
        qv = np.cross(tv, e1[None])
        v = np.einsum('ntk,ntk->nt', d[:,None,:], qv)*inv
        t = np.einsum('tk,ntk->nt', e2, qv)*inv
        return ok & (u>=0)&(v>=0)&(u+v<=1)&(t>1e-3)

    hit = mt_all(o, d)
    print("exact hits/ray: mean %.2f max %d" % (hit.sum(1).mean(), hit.sum(1).max()))

    # triangle Plucker columns (scaled)
    def edge_col(p, q):
        EV = np.cross(p, q)          # a x b
        EU = q - p
        s = np.maximum(np.linalg.norm(np.concatenate([EV, EU], -1), axis=-1), 1e-30)
        return EV/s[:,None], EU/s[:,None]
    cols = [edge_col(a, b), edge_col(b, c), edge_col(c, a)]
    nrm = np.cross(e1, e2)
    dpl = -np.einsum('tk,tk->t', nrm, a)
    spl = np.maximum(np.linalg.norm(np.concatenate([nrm, dpl[:,None]],-1),axis=-1),1e-30)
    nrm_s = nrm/spl[:,None]; dpl_s = dpl/spl

    # ray features (scaled)
    oxd = np.cross(o, d)
    r6 = np.concatenate([d, oxd], -1)
    rs = np.maximum(np.linalg.norm(r6, axis=-1), 1e-30)
    r6 = r6/rs[:,None]
    ro = np.concatenate([o, np.ones((n,1))], -1)
    ros = np.maximum(np.linalg.norm(ro, axis=-1), 1e-30)
    ro = ro/ros[:,None]

    def tobf(x): return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)

    # bf16 matmuls (simulate MXU: bf16 in, f32 accum)
    def bfdot(X, Y):  # (n,k)@(k,m)
        return np.asarray(jnp.dot(jnp.asarray(X,jnp.bfloat16), jnp.asarray(Y,jnp.bfloat16),
                           preferred_element_type=jnp.float32), np.float32)
    sides = []
    for EV, EU in cols:
        Y = np.concatenate([EV, EU], -1).T   # (6, T)
        sides.append(bfdot(r6, Y))
    pl1 = bfdot(ro, np.concatenate([nrm_s, dpl_s[:,None]],-1).T)
    pl2 = bfdot(d/np.linalg.norm(d,axis=-1,keepdims=True), nrm_s.T)

    for margin in (0.0, 0.005, 0.01, 0.02, 0.04):
        sp = [s > -margin for s in sides]
        sn = [s < margin for s in sides]
        same = (sp[0]&sp[1]&sp[2]) | (sn[0]&sn[1]&sn[2])
        # forward: sign(t) = -pl1/pl2 > 0 -> opposite signs (with margin)
        fwd = (pl1 > -margin) & (pl2 < margin) | (pl1 < margin) & (pl2 > -margin)
        cand = same & fwd
        fn = hit & ~cand
        # item-level stats (8-tri blocks in BVH order = table order)
        Ti = (T + 7)//8 * 8
        cp = np.zeros((n, Ti), bool); cp[:, :T] = cand
        items = cp.reshape(n, -1, 8).any(-1)
        print("margin %.3f: FN %d  survivors/lane tris %.2f items %.2f p99 %.0f max %d" %
              (margin, fn.sum(), cand.sum(1).mean(), items.sum(1).mean(),
               np.percentile(items.sum(1), 99), items.sum(1).max()))

if __name__ == "__main__":
    main()

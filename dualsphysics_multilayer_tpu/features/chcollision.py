"""Chrono-style rigid-body contact from collision meshes.

The reference delegates body-body collisions to the closed Project Chrono
library: bodies with a ``modelfile`` mesh participate in NSC/SMC contact
(`JChronoData.h:218-265` ``UseCollision``/``ModelFile``; XML surface
`doc/xml_format/_FmtXML_Chrono.xml` ``<collision activate>`` with
``distancedp``/``contactmethod``; coefficients from ``<properties>``:
Kfric, Restitution_Coefficient, Young_Modulus, PoissonRatio — same names
`JSph::LoadDemData` reads, `JSph.cpp:1189-1227`).

TPU-native re-design: instead of Chrono's incremental narrowphase we run a
DENSE point-vs-triangle sweep each step — every body's contact-point cloud
(mesh vertices + faces resampled at ~dp spacing) against every other body's
triangle soup, all bodies padded to one static (NB, P, 3) / (NB, Q, 3, 3)
shape and evaluated as one vmapped branchless pass.  Body counts are tiny
(<= dozens) and P*Q ~ 1e5-1e6 pair lanes, so the whole narrowphase is a few
Mflop of fused elementwise work — XLA-friendly, no host round-trips, and
exactly reproducible.  The contact force law is the solver's own DEM
visco-elastic Hertzian model (features/dem.py, the reference's built-in
`InteractionForcesDEM` family, `JSphCpu.cpp:828-960`) applied at mesh
contact points: the SMC ("smooth contacts") method; NSC inputs run through
the same regularized law (documented approximation — the reference's
complementarity solve does not map to a fixed-shape data-parallel device
program).

Forces/torques integrate exactly where the reference injects Chrono's:
into the per-body force accumulators ahead of the rigid solve
(`JSphCpuSingle::RunFloating` `JSphCpuSingle.cpp:930-945`), composing with
joints/springs (features/chrono.py) and moorings."""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True, eq=False)
class ChContactCfg:
    """Static contact tables.  Bodies are the chrono-declared bodies that
    carry a modelfile; ``body_ft`` maps each to its floating-body index
    (-1 = fixed/static collider).  Points/triangles are stored in BODY
    frame: relative to the body's initial center for floating bodies, world
    coordinates for fixed ones."""
    body_ft: np.ndarray     # (NB,) int32
    center0: np.ndarray     # (NB,3) f32 initial centers (0 for fixed)
    pts: np.ndarray         # (NB,P,3) f32 contact points, padded
    ptmask: np.ndarray      # (NB,P) bool
    tris: np.ndarray        # (NB,Q,3,3) f32 triangles, padded
    trimask: np.ndarray     # (NB,Q) bool
    tau: np.ndarray         # (NB,) (1-nu^2)/E per body
    kfric: np.ndarray       # (NB,)
    restitu: np.ndarray     # (NB,)
    mass: np.ndarray        # (NB,) body mass (fixed bodies: 0 -> bound rule)
    ddp: float              # contact distance (= distancedp * dp)
    dp: float


def sample_tri_points(tris, spacing):
    """Contact-point cloud for a triangle soup: vertices + a barycentric
    grid on each face at ~``spacing`` (the resolution GenCase rasterizes
    geometry at, so contact features align with the SPH lattice)."""
    pts = [tris.reshape(-1, 3)]
    for (a, b, c) in tris:
        na = max(int(np.linalg.norm(b - a) / spacing), 1)
        nb = max(int(np.linalg.norm(c - a) / spacing), 1)
        n = max(na, nb)
        for i in range(n + 1):
            for j in range(n + 1 - i):
                u, v = i / n, j / n
                if (i, j) in ((0, 0), (n, 0), (0, n)):
                    continue
                pts.append((a + u * (b - a) + v * (c - a))[None])
    allp = np.concatenate(pts, axis=0)
    # dedup on a fine grid to kill shared-edge duplicates
    key = np.round(allp / (0.25 * spacing)).astype(np.int64)
    _, keep = np.unique(key, axis=0, return_index=True)
    return allp[np.sort(keep)]


def make_chcontact(bodies, *, dp, distancedp=0.5, default_props=None):
    """Build the static tables.

    ``bodies``: list of dicts with keys ``ft`` (floating index or -1),
    ``tris`` ((q,3,3) world-frame mesh), ``center0`` ((3,) initial center,
    zeros for fixed), ``mass``, and material ``young/poisson/kfric/restitu``
    (reference defaults match `JSph::LoadDemData`)."""
    if not bodies:
        return None
    dflt = dict(young=1e6, poisson=0.3, kfric=0.45, restitu=0.5)
    dflt.update(default_props or {})
    NB = len(bodies)
    ptl, tril = [], []
    for bd in bodies:
        tris = np.asarray(bd["tris"], np.float64)
        c0 = np.asarray(bd.get("center0", (0.0, 0.0, 0.0)), np.float64)
        tris = tris - c0[None, None]
        ptl.append(sample_tri_points(tris, dp))
        tril.append(tris)
    P = max(max(len(p) for p in ptl), 1)
    Q = max(max(len(t) for t in tril), 1)
    pts = np.zeros((NB, P, 3), np.float32)
    ptmask = np.zeros((NB, P), bool)
    tris = np.zeros((NB, Q, 3, 3), np.float32)
    trimask = np.zeros((NB, Q), bool)
    for i, (p, t) in enumerate(zip(ptl, tril)):
        pts[i, :len(p)] = p
        ptmask[i, :len(p)] = True
        tris[i, :len(t)] = t
        trimask[i, :len(t)] = True

    def get(bd, k):
        v = bd.get(k)
        return dflt[k] if v is None else v

    return ChContactCfg(
        body_ft=np.asarray([bd["ft"] for bd in bodies], np.int32),
        center0=np.asarray([bd.get("center0", (0, 0, 0)) for bd in bodies],
                           np.float32),
        pts=pts, ptmask=ptmask, tris=tris, trimask=trimask,
        tau=np.asarray([(1.0 - get(bd, "poisson") ** 2) / get(bd, "young")
                        for bd in bodies], np.float32),
        kfric=np.asarray([get(bd, "kfric") for bd in bodies], np.float32),
        restitu=np.asarray([get(bd, "restitu") for bd in bodies], np.float32),
        mass=np.asarray([bd.get("mass", 0.0) for bd in bodies], np.float32),
        ddp=float(distancedp) * float(dp), dp=float(dp))


def closest_on_tri(p, a, b, c):
    """Branchless closest point on triangle abc to p (Ericson RTCD 5.1.5
    voronoi-region walk as a where-chain).  Broadcasts over leading dims."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.where(jnp.abs(va + vb + vc) > 1e-30, va + vb + vc, 1.0)
    v = vb / denom
    w = vc / denom
    # interior guess, then override by region
    eps = 1e-12
    vab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > eps, d1 - d3, 1.0),
                   0.0, 1.0)
    vac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) > eps, d2 - d6, 1.0),
                   0.0, 1.0)
    t4 = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > eps,
                               (d4 - d3) + (d5 - d6), 1.0)
    vbc = jnp.clip(t4, 0.0, 1.0)
    q = a + v[..., None] * ab + w[..., None] * ac
    q = jnp.where((vc <= 0) [..., None] & (d1 >= 0)[..., None]
                  & (d3 <= 0)[..., None],
                  a + vab[..., None] * ab, q)                    # edge AB
    q = jnp.where((vb <= 0)[..., None] & (d2 >= 0)[..., None]
                  & (d6 <= 0)[..., None],
                  a + vac[..., None] * ac, q)                    # edge AC
    q = jnp.where((va <= 0)[..., None] & ((d4 - d3) >= 0)[..., None]
                  & ((d5 - d6) >= 0)[..., None],
                  b + vbc[..., None] * (c - b), q)               # edge BC
    q = jnp.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, q)
    q = jnp.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, q)
    q = jnp.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, q)
    return q


def contact_forces(cc: ChContactCfg, B, R, center, fvel, fomega, dt):
    """Mesh-contact force/torque on every floating body.

    Returns ``(face, ftorque, dtterm)``: (B,3) world-frame force and torque
    sums (add to the rigid-solve accumulators) and the DEM dt-safety term
    (joins the viscdt reduction like apply_dem's)."""
    f32 = center.dtype
    NB = cc.body_ft.shape[0]
    bft = jnp.asarray(cc.body_ft)
    isfl = bft >= 0
    bidx = jnp.maximum(bft, 0)
    # world transform per contact body
    Rb = jnp.where(isfl[:, None, None],
                   jnp.take(R, bidx, axis=0),
                   jnp.eye(3, dtype=f32)[None])
    cb = jnp.where(isfl[:, None], jnp.take(center, bidx, axis=0),
                   jnp.asarray(cc.center0))
    vb = jnp.where(isfl[:, None], jnp.take(fvel, bidx, axis=0), 0.0)
    ob = jnp.where(isfl[:, None], jnp.take(fomega, bidx, axis=0), 0.0)

    ptsW = jnp.einsum("bij,bpj->bpi", Rb, jnp.asarray(cc.pts)) + cb[:, None]
    trisW = jnp.einsum("bij,bqvj->bqvi", Rb, jnp.asarray(cc.tris)) \
        + cb[:, None, None]
    ptm = jnp.asarray(cc.ptmask)
    trm = jnp.asarray(cc.trimask)
    tau = jnp.asarray(cc.tau)
    kfr = jnp.asarray(cc.kfric)
    rst = jnp.asarray(cc.restitu)
    bmass = jnp.asarray(cc.mass)
    ddp = jnp.asarray(cc.ddp, f32)
    kn_geo = jnp.sqrt(jnp.asarray(0.25 * cc.dp, f32))

    def pair(i, j):
        """Force on body i's points from body j's triangles.
        Returns (force_i (3,), torque_i (3,), force_j, torque_j, dtmax)."""
        p = ptsW[i]                                     # (P,3)
        t = trisW[j]                                    # (Q,3,3)
        q = closest_on_tri(p[:, None, :], t[None, :, 0], t[None, :, 1],
                           t[None, :, 2])               # (P,Q,3)
        d = p[:, None, :] - q
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-18))
        ovl = ddp - dist
        ok = (ptm[i][:, None] & trm[j][None, :] & (ovl > 0)
              & (dist > 1e-9))
        nrm = d / dist[..., None]
        # relative velocity at the contact point
        vi = vb[i] + jnp.cross(ob[i], p - cb[i])        # (P,3)
        vj = vb[j] + jnp.cross(ob[j], q - cb[j])        # (P,Q,3)
        dv = vi[:, None, :] - vj
        vn = jnp.sum(dv * nrm, -1)
        # DEM visco-elastic Hertzian law (features/dem.py)
        mi = jnp.where(isfl[i], bmass[i], 0.0)
        mj = jnp.where(isfl[j], bmass[j], 0.0)
        nu_mass = jnp.where(isfl[i] & isfl[j],
                            mi * mj / jnp.maximum(mi + mj, 1e-30),
                            0.5 * jnp.maximum(mi, mj))
        kn = 4.0 / (3.0 * (tau[i] + tau[j])) * kn_geo
        o = jnp.maximum(ovl, 0.0)
        eij = jnp.clip(0.5 * (rst[i] + rst[j]), 1e-4, 0.999999)
        ln_e = jnp.log(eij)
        gn = -(2.0 * ln_e * jnp.sqrt(nu_mass * kn)) / jnp.sqrt(
            math.pi + ln_e * ln_e)
        fn = kn * o ** 1.5 - gn * o ** 0.25 * vn
        w = ok.astype(f32)
        fvec = (w * fn)[..., None] * nrm
        dvt = dv - vn[..., None] * nrm
        vt = jnp.sqrt(jnp.maximum(jnp.sum(dvt * dvt, -1), 1e-18))
        ft = jnp.minimum(0.5 * (kfr[i] + kfr[j]) * fn * jnp.tanh(8.0 * vt),
                         2.0 * (kn * dt - gn) * vt / 7.0)
        # tangential force along +t like the reference DEM (JSphCpu.cpp:908)
        fvec = fvec + (w * ft)[..., None] * (dvt / vt[..., None])
        demv = (0.2 * 40.0 / 3.21) * jnp.power(
            jnp.maximum(nu_mass, 1e-30) / kn, -0.4) * jnp.power(
            jnp.abs(vn), 0.2)
        dtmax = jnp.max(jnp.where(ok, demv, 0.0), initial=jnp.asarray(0., f32))
        f_i = jnp.sum(fvec, axis=(0, 1))
        tq_i = jnp.sum(jnp.cross(p[:, None] - cb[i], fvec), axis=(0, 1))
        tq_j = jnp.sum(jnp.cross(q - cb[j], -fvec), axis=(0, 1))
        return f_i, tq_i, -f_i, tq_j, dtmax

    face = jnp.zeros((B, 3), f32)
    ftq = jnp.zeros((B, 3), f32)
    dtterm = jnp.asarray(0.0, f32)
    for i in range(NB):
        for j in range(NB):
            if i == j:
                continue
            if cc.body_ft[i] < 0 and cc.body_ft[j] < 0:
                continue    # fixed-fixed never produces motion
            fi, ti, fj, tj, dm = pair(i, j)
            if cc.body_ft[i] >= 0:
                face = face.at[cc.body_ft[i]].add(fi)
                ftq = ftq.at[cc.body_ft[i]].add(ti)
            if cc.body_ft[j] >= 0:
                face = face.at[cc.body_ft[j]].add(fj)
                ftq = ftq.at[cc.body_ft[j]].add(tj)
            dtterm = jnp.maximum(dtterm, dm)
    return face, ftq, dtterm

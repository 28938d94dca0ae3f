import time, jax, jax.numpy as jnp, numpy as np
from dualsphysics_multilayer_tpu.models import cases
from dualsphysics_multilayer_tpu.ops import celldiv as cd
from dualsphysics_multilayer_tpu.ops.pallas import cellforce as CF
from dualsphysics_multilayer_tpu import typesdef as td

case = cases.dambreak3d(dp=0.0072, obstacle=True)
csp, dom, st = case.csp, case.dom, case.state
n = st.n
ncells = dom.ncells
print(f"n={n} ncells={ncells} nc={dom.nc} maxcells={dom.maxcells}")
T, W = CF.tiles_for(dom)
pos, code = st.pos, st.code

def timeit(f, *a, n_=10):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_):
        out = g(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_ * 1e3

ncx, ncy, ncz = dom.nc
def coords_and_sort(pos, code):
    cxyz = cd.cell_coords(dom, pos, None)
    inside = jnp.all((cxyz >= 0) & (cxyz < jnp.array(dom.nc, jnp.int32)), axis=1)
    live = td.is_active(code) & inside
    cellid = (cxyz[:, 2] * ncy + cxyz[:, 1]) * ncx + cxyz[:, 0]
    cellid = jnp.where(live, cellid, ncells)
    order = jnp.argsort(cellid, stable=True).astype(jnp.int32)
    return order, cellid

print(f"coords+argsort: {timeit(coords_and_sort, pos, code):.2f} ms")

order, cellid = jax.jit(coords_and_sort)(pos, code)
scid = cellid[order]
def build_cellstart(scid):
    iar = jnp.arange(n, dtype=jnp.int32)
    cs = jnp.full((ncells + 1,), n, jnp.int32).at[
        jnp.minimum(scid, ncells)].min(iar, mode="drop")
    return jax.lax.associative_scan(jnp.minimum, cs, reverse=True)
print(f"cellstart: {timeit(build_cellstart, scid):.2f} ms")

def full(pos, code):
    return cd.divide_sorted(dom, pos, code, tile_t=T, tile_w=W,
                            group_sx=CF.GROUP_SX,
                            maxgroups=CF.maxgroups_for(dom, n))
print(f"divide_sorted total: {timeit(full, pos, code):.2f} ms")

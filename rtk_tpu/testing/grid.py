"""Macro-grid DDA tracing: the incoherent-ray engine, round 2.

The binned engine (testing/binned.py, demoted r4) re-bins rays over BVH subtree cuts,
but subtree bins OVERLAP spatially, so after a ray finds a hit it must
still trace every bin whose entry distance precedes it — measured ~6 live
rounds per ray on the atrium bounce (docs/PERF_NOTES.md r2).  This engine
re-bins over a uniform macro-grid instead: cells are DISJOINT, rays visit
them in strict t order (Amanatides-Woo DDA, pure arithmetic — no gathers,
which is what TPU lanes want), and a ray terminates the moment its best
hit precedes the current cell's exit — typically 1-2 live rounds.

Structure:
  build: triangles are conservatively binned into grid cells (AABB
    overlap, duplicated per cell), each cell's list padded to whole
    leaf-size clusters, and ONE merged LBVH is built with cell-prefixed
    local Morton keys — every cell's range is then exactly a Karras
    subtree, packed as a forest in one vectorised multi-root BFS
    (trace/packed.py pack_multiroot); cell rank == packed entry id.
  trace: per round (all one fused program): skip empty cells, group live
    rays by cell (one multi-operand sort), one packet-kernel dispatch
    with per-packet cell roots, merge, retire finished rays, DDA-advance
    the rest.  A final full-tree pass over still-live rays keeps the
    engine exact under the round budget.

Reference semantics preserved: nearest hit, open (min_t, max_t) t-window,
strict < tie (rtk.c:543-577); duplicated triangles re-test at identical t
and lose the strict-< tie, so records match the flat engine's.
"""
from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtk_tpu.builder.lbvh import leaf_code
from rtk_tpu.config import BuildConfig
from rtk_tpu.scene import Scene, build_from_soup
from rtk_tpu.trace.packed import PackedScene, pack_multiroot, pack_scene
from rtk_tpu.types import PacketHits, Rays

Array = jax.Array

_BIG = 3.0e38


class GridScene(struct.PyTreeNode):
    """Macro-grid acceleration structure (product of build_grid).

    cells: forest-packed per-cell trees (duplicated triangles).
    flat: the ordinary packed scene (exact fallback + record tables).
    rank: (prod(dims),) i32: occupied cell -> rank (>= 0); empty cell ->
      minus the chebyshev distance to the nearest occupied cell (the
      trace's empty-space leap field).
    cells_to_flat: (Tp_cells,) i32 flat-table slot per cells-table slot
      (hit records are returned in flat-table space).
    """

    cells: PackedScene
    flat: PackedScene
    rank: Array
    cells_to_flat: Array
    grid_lo: Array  # (3,) f32
    cell_size: Array  # (3,) f32
    dims: tuple = struct.field(pytree_node=False)
    n_occ: int = struct.field(pytree_node=False)
    # build_grid(march=True): a second forest pack with one root per CELL
    # (empty cells get childless rows), entry id == cell id — the fused
    # march kernel adopts cells by index with no rank lookup.
    cells_march: PackedScene | None = None
    march_to_flat: Array | None = None


def _interleave6(q: np.ndarray) -> np.ndarray:
    """Spread 6-bit ints so bits land 3 apart (host helper)."""
    q = q.astype(np.uint32)
    q = (q | (q << 8)) & 0x0300F
    q = (q | (q << 4)) & 0x030C3
    q = (q | (q << 2)) & 0x09249
    return q


def choose_dims(extent: np.ndarray, n_tris: int, max_cells: int = 4096,
                target: int = 48) -> tuple:
    """Per-axis cell counts: roughly cubical cells, ~target tris/cell,
    <= max_cells total, each axis in [1, 32]."""
    want = min(max_cells, max(1, n_tris // target))
    ext = np.maximum(extent, 1e-30)
    base = (want / float(ext.prod())) ** (1.0 / 3.0)
    dims = np.maximum(1, np.floor(ext * base)).astype(np.int64)
    dims = np.minimum(dims, 32)
    while dims.prod() > max_cells:
        dims[dims.argmax()] -= 1
    return tuple(int(x) for x in dims)


def build_grid(tri_pos, tri_vidx=None, tri_mesh=None, tri_prim=None,
               config: BuildConfig = BuildConfig(), dims=None,
               max_cells: int = 4096, flat: PackedScene | None = None,
               scene: Scene | None = None, tri_mask=None,
               march: bool = False) -> GridScene:
    """Build the macro-grid structure from a triangle soup.

    flat/scene: reuse an existing ordinary build of the SAME soup (same
    config) for the exact-fallback path; built here when not given.

    tri_mask: optional (T,) per-triangle filter bits in soup order (24
    bits, pack_scene semantics) — packed into BOTH the per-cell tables
    and the exact-residual flat tables so filter_mask queries cull in
    every round.  A caller-supplied `flat` must already carry the same
    mask (pack_scene(scene, tri_mask=...)).
    """
    tp = np.asarray(tri_pos, np.float32)
    T = tp.shape[0]
    k = config.leaf_size
    tlo = tp.min(axis=1)
    thi = tp.max(axis=1)
    glo = tlo.min(axis=0)
    ghi = thi.max(axis=0)
    ext = ghi - glo
    pad = np.maximum(ext, 1.0) * 1e-5
    glo = glo - pad
    ext = ext + 2 * pad
    if dims is None:
        dims = choose_dims(ext, T, max_cells=max_cells)
    dims = tuple(int(d) for d in dims)
    dx, dy, dz = dims
    cs = ext / np.array(dims, np.float64)

    # Conservative tri->cell assignment (AABB overlap; duplicates are
    # exact re-tests, never wrong results).
    c0 = np.clip(((tlo - glo) / cs).astype(np.int64), 0,
                 np.array(dims) - 1)
    c1 = np.clip(((thi - glo) / cs).astype(np.int64), 0,
                 np.array(dims) - 1)
    cnt3 = c1 - c0 + 1
    counts = cnt3.prod(axis=1)
    total = int(counts.sum())
    rep = np.repeat(np.arange(T, dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_in = np.arange(total, dtype=np.int64) - offs[rep]
    nz = cnt3[rep, 2]
    ny = cnt3[rep, 1]
    oz = rank_in % nz
    r2 = rank_in // nz
    oy = r2 % ny
    ox = r2 // ny
    cx = c0[rep, 0] + ox
    cy = c0[rep, 1] + oy
    cz = c0[rep, 2] + oz
    cell = (cx * dy + cy) * dz + cz

    # Group pairs by cell; pad each cell to whole leaf clusters so cell
    # boundaries align with cluster boundaries (pads duplicate the cell's
    # last pair — real triangles, harmless re-tests).
    order = np.argsort(cell, kind="stable")
    cell_s = cell[order]
    ucell, start, ccount = np.unique(cell_s, return_index=True,
                                     return_counts=True)
    n_occ = ucell.shape[0]
    pad_per = (-ccount) % k
    padded = ccount + pad_per
    ptot = int(padded.sum())
    pcum = np.concatenate([[0], np.cumsum(padded)])
    grp = np.repeat(np.arange(n_occ, dtype=np.int64), padded)
    pos_in = np.arange(ptot, dtype=np.int64) - pcum[grp]
    src_row = start[grp] + np.minimum(pos_in, ccount[grp] - 1)
    pair_tri = rep[order][src_row]  # original tri id per padded pair

    # Cell-prefixed local Morton keys: cell rank in the top bits makes
    # every cell an exact Karras subtree of the ONE merged build.
    cell3 = np.stack([ucell // (dy * dz), (ucell // dz) % dy, ucell % dz],
                     axis=1)[grp]
    cent = tp[pair_tri].mean(axis=1)
    nrm = np.clip((cent - (glo + cell3 * cs)) / cs, 0.0, 0.999999)
    q = (nrm * 64.0).astype(np.uint32)
    local = (_interleave6(q[:, 0]) << 2) | (_interleave6(q[:, 1]) << 1) \
        | _interleave6(q[:, 2])
    if n_occ > (1 << 14):
        # grp rides the top 14 bits of the uint32 sort key (18 bits of
        # local Morton below); more occupied cells would alias and break
        # the cells-are-Karras-subtrees invariant.
        raise ValueError(
            f"{n_occ} occupied cells exceeds the 16384-cell key budget; "
            "use coarser dims= (or the default max_cells heuristic)")
    codes = (grp.astype(np.uint32) << np.uint32(18)) | local

    # Per-pair record arrays (records report the ORIGINAL soup entities).
    if tri_vidx is None:
        pv = (pair_tri[:, None] * 3
              + np.arange(3, dtype=np.int64)[None, :]).astype(np.int32)
    else:
        pv = np.asarray(tri_vidx, np.int32)[pair_tri]
    pm = (np.zeros(ptot, np.int32) if tri_mesh is None
          else np.asarray(tri_mesh, np.int32)[pair_tri])
    pp = (pair_tri.astype(np.int32) if tri_prim is None
          else np.asarray(tri_prim, np.int32)[pair_tri])

    merged = build_from_soup(tp[pair_tri], pv, pm, pp, config=config,
                             codes=codes)

    # Per-cell subtree roots: cell c covers clusters [cl0, cl1]; with >= 2
    # clusters that range is exactly one Karras node (cell bits split
    # first); a single cluster is the leaf itself.
    ccl = padded // k
    ccum = np.concatenate([[0], np.cumsum(ccl)])
    if merged.num_leaves == 1:
        roots = np.array([leaf_code(0)], np.int64)
    else:
        b_lo = np.asarray(merged.bin_lo)
        b_hi = np.asarray(merged.bin_hi)
        rangemap = {(int(l), int(h)): i
                    for i, (l, h) in enumerate(zip(b_lo, b_hi))}
        roots = np.empty(n_occ, np.int64)
        for r in range(n_occ):
            lo, hi = int(ccum[r]), int(ccum[r + 1]) - 1
            roots[r] = (leaf_code(lo) if lo == hi
                        else rangemap[(lo, hi)])
    # The merged build's "soup" is the padded (cell, tri) pair list, so
    # the mask enters pack_multiroot in pair order.
    mask_pairs = (None if tri_mask is None
                  else np.asarray(tri_mask, np.int64)[pair_tri])
    cells_packed = pack_multiroot(merged, roots, tri_mask=mask_pairs)
    cells_march = None
    if march:
        # One root per CELL (empty cells -1 -> childless rows): the march
        # kernel adopts cells by index, entry id == cell id.
        roots_cells = np.full(dx * dy * dz, -1, np.int64)
        roots_cells[ucell] = roots
        cells_march = pack_multiroot(merged, roots_cells,
                                     tri_mask=mask_pairs)

    if flat is None:
        if scene is None:
            scene = build_from_soup(tp, tri_vidx, tri_mesh, tri_prim,
                                    config=config)
        flat = pack_scene(scene, tri_mask=tri_mask)

    # cells-table slot -> flat-table slot (for record unification).
    flat_sorted_of_slot = np.asarray(flat.tri_perm, np.int64)
    # flat: packed slot -> sorted slot -> original soup id.  Keep the
    # caller-supplied Scene even when flat is also given: scene.perm is
    # the only correct soup-id map for multi-mesh soups (flat.tri_prim
    # is the per-MESH primitive index, rtk.h:41 semantics).
    if scene is not None:
        flat_scene_perm = np.asarray(scene.perm, np.int64)
        orig_of_flat = np.where(
            flat_sorted_of_slot >= 0,
            flat_scene_perm[np.clip(flat_sorted_of_slot, 0, None)], -1)
    else:
        if tri_prim is not None or tri_mesh is not None:
            raise ValueError(
                "build_grid(flat=...) with custom tri_prim/tri_mesh "
                "needs scene= too (flat.tri_prim holds per-mesh prim "
                "ids, not soup ids)")
        # prim ids ARE soup ids (single-mesh default soup).
        orig_of_flat = np.asarray(flat.tri_prim, np.int64)
    flat_of_orig = np.full(T, -1, np.int64)
    valid = orig_of_flat >= 0
    flat_of_orig[orig_of_flat[valid]] = np.nonzero(valid)[0]
    # cells packed slot -> merged SORTED slot -> pair row -> original tri
    # -> flat slot.  (tri_perm is packed->sorted; merged.perm is
    # sorted->input pair row — composing only the first mapped records to
    # a scrambled triangle within the right cell: t was correct, the
    # reported triangle/vertex records were not.)
    merged_perm = np.asarray(merged.perm, np.int64)

    def c2f_of(pack):
        cells_sorted = np.asarray(pack.tri_perm, np.int64)
        cells_pair = np.where(
            cells_sorted >= 0,
            merged_perm[np.clip(cells_sorted, 0, None)], -1)
        cells_orig = np.where(cells_pair >= 0,
                              pair_tri[np.clip(cells_pair, 0, None)], -1)
        return np.where(cells_orig >= 0,
                        flat_of_orig[np.clip(cells_orig, 0, None)], -1)

    c2f = c2f_of(cells_packed)
    march_c2f = None if cells_march is None else c2f_of(cells_march)

    # Combined rank/distance table: occupied cell -> rank (>= 0); empty
    # cell -> -d where d is the CHEBYSHEV distance to the nearest occupied
    # cell.  One gather then serves both the grouping bin and the
    # empty-space leap (every cell within chebyshev d-1 is empty, so a ray
    # may fast-forward d-2 cell-widths past its current exit in one step).
    occ3 = np.zeros((dx, dy, dz), bool)
    occ3.reshape(-1)[ucell] = True
    big = np.iinfo(np.int32).max // 2
    dist = np.where(occ3, 0, big).astype(np.int64)
    for _ in range(int(np.sum(~occ3) and max(dims))):
        p = np.pad(dist, 1, constant_values=big)
        m = dist
        for sx_ in (0, 1, 2):
            for sy_ in (0, 1, 2):
                for sz_ in (0, 1, 2):
                    if sx_ == 1 and sy_ == 1 and sz_ == 1:
                        continue
                    m = np.minimum(
                        m, p[sx_:sx_ + dx, sy_:sy_ + dy, sz_:sz_ + dz] + 1)
        if np.array_equal(m, dist):
            break
        dist = m
    dist = np.minimum(dist, 255)

    rank_tbl = np.full(dx * dy * dz, -1, np.int32)
    rank_tbl[ucell] = np.arange(n_occ, dtype=np.int32)
    empty = rank_tbl < 0
    rank_tbl[empty] = -np.maximum(dist.reshape(-1)[empty], 1).astype(
        np.int32)

    return GridScene(
        cells=cells_packed,
        flat=flat,
        rank=jnp.asarray(rank_tbl),
        cells_to_flat=jnp.asarray(c2f.astype(np.int32)),
        grid_lo=jnp.asarray(glo.astype(np.float32)),
        cell_size=jnp.asarray(cs.astype(np.float32)),
        dims=dims,
        n_occ=n_occ,
        cells_march=cells_march,
        march_to_flat=(None if march_c2f is None
                       else jnp.asarray(march_c2f.astype(np.int32))),
    )


def _crcp(d):
    big = jnp.where(d >= 0, _BIG, -_BIG)
    return jnp.where(d == 0.0, big, 1.0 / d)


def _grid_impl(grid_arrays, o, d, mint, maxt, idx, *, dims, n_occ, unit,
               rounds, skips, caps, mode, watertight, interpret, n,
               filter_mask, debug_counts=False, lesion="",
               sort_mode="multi"):
    """The whole marching loop as one device program (see module doc)."""
    from rtk_tpu.ops.pallas_trace import trace_packets

    cells, flat, rank_tbl, c2f, glo, cs = grid_arrays
    dx, dy, dz = dims
    M = o.shape[0]
    sub_shift = max(5, M.bit_length() - 16)
    dimv = jnp.asarray(dims, jnp.float32)

    mint0 = mint  # original order, for the final u/v re-test
    ox, oy, ozz = o[:, 0], o[:, 1], o[:, 2]
    dxx, dyy, dzz = d[:, 0], d[:, 1], d[:, 2]
    rcp = [_crcp(dxx), _crcp(dyy), _crcp(dzz)]

    # --- DDA init: grid entry + first cell + per-axis boundary ts ---
    ghi = glo + cs * dimv
    near = jnp.full((M,), -_BIG)
    far = jnp.full((M,), _BIG)
    for a, (oc, rc) in enumerate(zip((ox, oy, ozz), rcp)):
        t0 = (glo[a] - oc) * rc
        t1 = (ghi[a] - oc) * rc
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    s0 = jnp.maximum(near, 0.0)
    done = (near > far) | (far < 0.0) | (maxt <= mint) | (idx >= n)
    ii = []
    for a, (oc, dc, rc) in enumerate(zip((ox, oy, ozz), (dxx, dyy, dzz),
                                         rcp)):
        p = oc + dc * s0
        i = jnp.clip(jnp.floor((p - glo[a]) / cs[a]).astype(jnp.int32),
                     0, dims[a] - 1)
        ii.append(i)

    best_t = maxt
    best_s = jnp.full((M,), -1, jnp.int32)

    def pack_cell(ix, iy, iz, dd, ab):
        """>=0 marching; -1 finished for good; -2 aborted (the final
        full-tree residual must cover it)."""
        return jnp.where(ab, -2, jnp.where(dd, -1,
                                           (ix * dy + iy) * dz + iz))

    def advance(ix, iy, iz, tmx, tmy, tmz, mask, step, tdel):
        """One DDA step where mask; returns new state + left-grid flag.

        step/tdel are passed explicitly: the round body rebuilds them
        after each grouping sort (they are not carried through it), and a
        closure would see stale pre-sort bindings from the init scope."""
        mx = (tmx <= tmy) & (tmx <= tmz)
        my = ~mx & (tmy <= tmz)
        mz = ~mx & ~my
        ix2 = ix + jnp.where(mx, step[0], 0)
        iy2 = iy + jnp.where(my, step[1], 0)
        iz2 = iz + jnp.where(mz, step[2], 0)
        out = ((ix2 < 0) | (ix2 >= dx) | (iy2 < 0) | (iy2 >= dy)
               | (iz2 < 0) | (iz2 >= dz))
        tmx2 = tmx + jnp.where(mx, tdel[0], 0.0)
        tmy2 = tmy + jnp.where(my, tdel[1], 0.0)
        tmz2 = tmz + jnp.where(mz, tdel[2], 0.0)
        sel = lambda a, b: jnp.where(mask, a, b)
        return (sel(ix2, ix), sel(iy2, iy), sel(iz2, iz),
                sel(tmx2, tmx), sel(tmy2, tmy), sel(tmz2, tmz),
                mask & out)

    ix, iy, iz = ii
    cell = pack_cell(ix, iy, iz, done, False)

    # Stream state: 11 sorted operands per round (tmx/tmy/tmz are
    # recomputed from the cell index each round, and u/v are recovered by
    # ONE single-triangle re-test at the very end — both cut the
    # multi-operand grouping sort, the round's fixed cost).
    st = (idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t, best_s, cell)

    def one_round(st):
        (idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t,
         best_s, cell) = st
        abort = cell == -2
        done = cell == -1
        marching = cell >= 0
        safe = jnp.maximum(cell, 0)
        ix = safe // (dy * dz)
        iy = (safe // dz) % dy
        iz = safe % dz
        # rebuild per-row step/tdel/tm (not carried through sorts; the
        # next-boundary ts are a pure function of (cell, origin, dir))
        rcp = [_crcp(dxx), _crcp(dyy), _crcp(dzz)]
        step = [jnp.where(dc >= 0, 1, -1).astype(jnp.int32)
                for dc in (dxx, dyy, dzz)]
        tdel = [cs[a] * jnp.abs(rcp[a]) for a in range(3)]
        tms = []
        for a, (ia, oc, dc, rc) in enumerate(
                zip((ix, iy, iz), (ox, oy, ozz), (dxx, dyy, dzz), rcp)):
            nb = glo[a] + (ia + (dc >= 0).astype(jnp.int32)).astype(
                jnp.float32) * cs[a]
            tms.append((nb - oc) * rc)
        tmx, tmy, tmz = tms

        # --- empty-space leaps: one gather serves occupancy AND the
        # chebyshev distance field (rank_tbl holds -d for empty cells),
        # so each skip iteration fast-forwards past an entire empty run
        # (d-2 cell-widths beyond the current exit) instead of one cell.
        tmin3 = jnp.minimum(tdel[0], jnp.minimum(tdel[1], tdel[2]))
        far = jnp.full_like(tmx, _BIG)
        ghi_ = glo + cs * jnp.asarray(dims, jnp.float32)
        for a, (oc, rc) in enumerate(zip((ox, oy, ozz), rcp)):
            t0_ = (glo[a] - oc) * rc
            t1_ = (ghi_[a] - oc) * rc
            far = jnp.minimum(far, jnp.maximum(t0_, t1_))
        for _ in range(skips):
            if "norank" in lesion:  # lesion: timing probe only
                rank = (safe % 7).astype(jnp.int32) - 3
            else:
                rank = jnp.take(rank_tbl,
                                jnp.minimum(safe, dx * dy * dz - 1))
            exit_t = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
            emp = marching & (rank < 0)
            fin = emp & (exit_t >= best_t)  # marched past any useful t
            done = done | fin
            marching = marching & ~fin
            emp = emp & ~fin
            dlp = (-rank).astype(jnp.float32)
            # d == 1: the adjacent cell may be occupied.  A positional
            # re-sample with a nudge can overshoot a corner-clipped cell
            # whose ray segment is shorter than the nudge, silently
            # skipping its geometry — take the EXACT incremental DDA
            # step instead (same advance as the occupied-cell march).
            near = emp & (dlp < 1.5)
            ix, iy, iz, tmx, tmy, tmz, leftg = advance(
                ix, iy, iz, tmx, tmy, tmz, near, step, tdel)
            done = done | leftg
            marching = marching & ~leftg
            emp = emp & ~leftg
            # d >= 2 leap: all cells within chebyshev d-1 of the current
            # (empty) cell are empty; the exit crossing plus
            # (d-2)-cell-widths of travel (and the boundary nudge) stays
            # within that ball, so the landing cell is always EMPTY —
            # re-sampling the position there never skips geometry.
            leap = emp & ~near
            t_new = exit_t + jnp.maximum(dlp - 2.0, 0.0) * tmin3 \
                + 1e-4 * tmin3
            leftg = leap & (t_new >= far)
            done = done | leftg
            marching = marching & ~leftg
            leap = leap & ~leftg
            new_i = []
            new_tm = []
            oob = jnp.zeros_like(emp)
            for a, (oc, dc, rc) in enumerate(
                    zip((ox, oy, ozz), (dxx, dyy, dzz), rcp)):
                pa = oc + dc * t_new
                ia = jnp.floor((pa - glo[a]) / cs[a]).astype(jnp.int32)
                oob = oob | (ia < 0) | (ia >= dims[a])
                ia = jnp.clip(ia, 0, dims[a] - 1)
                nb = glo[a] + (ia + (dc >= 0).astype(jnp.int32)).astype(
                    jnp.float32) * cs[a]
                new_i.append(ia)
                new_tm.append((nb - oc) * rc)
            leftg = leap & oob
            done = done | leftg
            marching = marching & ~leftg
            leap = leap & ~leftg
            sel = lambda a_, b_: jnp.where(leap, a_, b_)
            ix, iy, iz = sel(new_i[0], ix), sel(new_i[1], iy), sel(
                new_i[2], iz)
            tmx, tmy, tmz = (sel(new_tm[0], tmx), sel(new_tm[1], tmy),
                             sel(new_tm[2], tmz))
            safe = jnp.clip((ix * dy + iy) * dz + iz, 0, dx * dy * dz - 1)

        rank = ((safe % 7).astype(jnp.int32) - 3 if "norank" in lesion
                else jnp.take(rank_tbl, safe))
        # Still in an empty cell after the skip budget: park the ray for
        # the exactness residual rather than stall it.
        stuck = marching & (rank < 0)
        abort = abort | stuck
        marching = marching & ~stuck
        rank = jnp.where(marching, rank, n_occ)

        # --- group by cell rank (pads fill each rank to whole packets).
        # Pad->bin assignment via a scatter+cumsum table: table[j] =
        # #cells whose pad range starts at or before ordinal j
        # (searchsorted over the 2.5k boundaries measured 118 ms/round on
        # 1.37M rows; this is one small scatter + one gather).
        is_pad = idx >= n
        counts = jnp.bincount(jnp.where(marching, rank, n_occ),
                              length=n_occ + 1)[:n_occ]
        need = ((-counts) % unit).astype(jnp.int32)
        cum = jnp.cumsum(need)
        pt = n_occ * unit  # max total pad need (need < unit per cell)
        mark = jnp.zeros((pt + 1,), jnp.int32).at[
            jnp.minimum(cum, pt)].add(1)
        pbin_tbl = jnp.cumsum(mark)[:pt]
        padj = jnp.cumsum(is_pad.astype(jnp.int32)) - 1
        pbin = jnp.take(pbin_tbl, jnp.clip(padj, 0, pt - 1))
        bin_r = jnp.where(is_pad, jnp.minimum(pbin, n_occ), rank)
        # 16-bit sub-key preserves current stream order at >= sub_shift
        # granularity (packets only need unit-level coherence); pads sort
        # behind the real rays of their bin.
        pos = (jnp.arange(idx.shape[0], dtype=jnp.uint32)
               >> jnp.uint32(sub_shift))
        sub = jnp.where(is_pad, jnp.uint32(0xFFFF),
                        jnp.minimum(pos, jnp.uint32(0xFFFE)))
        key = (bin_r.astype(jnp.uint32) << jnp.uint32(16)) | sub
        cell = pack_cell(ix, iy, iz, done, abort)
        if "nosort" in lesion:  # lesion: timing probe only
            pass
        elif sort_mode == "gather":
            # Sort only (key, ordinal); move the 10 payload operands with
            # two packed row-gathers (one f32 matrix, one i32 matrix) —
            # races the 12-operand comparator sort, whose data movement
            # grows with operand count.
            rows = idx.shape[0]
            key, ordr = jax.lax.sort(
                (key, jnp.arange(rows, dtype=jnp.uint32)), num_keys=1)
            fmat = jnp.stack([ox, oy, ozz, dxx, dyy, dzz, mint, best_t],
                             axis=1)
            imat = jnp.stack([idx.astype(jnp.int32), best_s, cell], axis=1)
            fmat = jnp.take(fmat, ordr, axis=0)
            imat = jnp.take(imat, ordr, axis=0)
            ox, oy, ozz, dxx, dyy, dzz, mint, best_t = [
                fmat[:, j] for j in range(8)]
            idx = imat[:, 0].astype(jnp.uint32)
            best_s = imat[:, 1]
            cell = imat[:, 2]
        else:
            (key, idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t,
             best_s, cell) = jax.lax.sort(
                 (key, idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t,
                  best_s, cell), num_keys=1)
        bin_s = (key >> jnp.uint32(16)).astype(jnp.int32)
        abort = cell == -2
        done = cell == -1
        marching = cell >= 0

        # --- one kernel dispatch over the grouped prefix ---
        roots = jnp.minimum(bin_s[::unit], n_occ - 1)
        # Under a round capacity the prefix may hold too few pad rows to
        # fill every cell's run to whole packets; rays in a packet whose
        # root is another cell must not trace (wrong subtree, and the
        # march would walk past the miss) — park them for the residual.
        mism = marching & (bin_s != jnp.repeat(roots, unit))
        abort = abort | mism
        marching = marching & ~mism
        live_row = marching & (idx < n)
        if "nokernel" in lesion:  # lesion: timing probe only
            h = None
        else:
          h = trace_packets(
            cells, Rays(origin=jnp.stack([ox, oy, ozz], axis=1),
                        direction=jnp.stack([dxx, dyy, dzz], axis=1),
                        min_t=mint,
                        max_t=jnp.where(live_row, best_t, 0.0)),
            mode=mode, watertight=watertight, interpret=interpret,
            pkt=unit, packet_roots=roots, sort_rays=False,
            filter_mask=filter_mask)
        if h is not None:
            improved = h.slot >= 0
            best_t = jnp.where(improved, h.t, best_t)
            best_s = jnp.where(improved, h.slot, best_s)

        # --- retire + advance (tm recomputed from the sorted cells) ---
        ix = jnp.maximum(cell, 0) // (dy * dz)
        iy = (jnp.maximum(cell, 0) // dz) % dy
        iz = jnp.maximum(cell, 0) % dz
        rcp = [_crcp(dxx), _crcp(dyy), _crcp(dzz)]
        step = [jnp.where(dc >= 0, 1, -1).astype(jnp.int32)
                for dc in (dxx, dyy, dzz)]
        tdel = [cs[a] * jnp.abs(rcp[a]) for a in range(3)]
        tms = []
        for a, (ia, oc, dc, rc) in enumerate(
                zip((ix, iy, iz), (ox, oy, ozz), (dxx, dyy, dzz), rcp)):
            nb = glo[a] + (ia + (dc >= 0).astype(jnp.int32)).astype(
                jnp.float32) * cs[a]
            tms.append((nb - oc) * rc)
        tmx, tmy, tmz = tms
        exit_t = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
        fin = marching & (best_t <= exit_t)
        if mode == "any":
            fin = fin | (marching & (best_s >= 0))
        done = done | fin
        marching = marching & ~fin
        ix, iy, iz, tmx, tmy, tmz, left = advance(
            ix, iy, iz, tmx, tmy, tmz, marching, step, tdel)
        done = done | left
        marching = marching & ~left
        cell = pack_cell(ix, iy, iz, done, abort)

        row = jnp.stack([jnp.sum(live_row.astype(jnp.int32)),
                         jnp.sum(marching.astype(jnp.int32)),
                         jnp.sum(abort.astype(jnp.int32))]).astype(
                             jnp.int32)
        return (idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t,
                best_s, cell), row

    cnts = jnp.zeros((max(rounds, 1), 3), jnp.int32)
    # Consecutive equal caps share ONE compiled round instance under
    # fori_loop, so compile time scales with the number of DISTINCT cap
    # segments, not the round budget (fully unrolled multi-round programs
    # took minutes to compile over the tunnel).  Shrinking caps are safe:
    # each round's grouping sort puts marching rays (bin < n_occ) ahead of
    # retired rays and spare pads, so round r+1 only needs
    # marching_r + n_occ*unit rows of prefix; rays a too-small cap
    # strands are aborted to the exactness residual, never dropped.
    r0 = 0
    for cap, cnt in [(c, len(list(g)))
                     for c, g in itertools.groupby(caps[:rounds])]:
        head = tuple(a[:cap] for a in st)
        tail = [a[cap:] for a in st]

        def fbody(r, carry):
            h, cn = carry
            h, row = one_round(h)
            cn = jax.lax.dynamic_update_slice(cn, row[None], (r, 0))
            return h, cn

        if cnt == 1:
            head, row = one_round(head)
            cnts = cnts.at[r0].set(row)
        else:
            head, cnts = jax.lax.fori_loop(r0, r0 + cnt, fbody,
                                           (head, cnts))
        st = tuple(jnp.concatenate([a, b])
                   for a, b in zip(head, tail))
        r0 += cnt

    (idx, ox, oy, ozz, dxx, dyy, dzz, mint, best_t, best_s, cell) = st

    # Records in flat-table space (one gather, once).
    best_s = jnp.where(best_s >= 0,
                       jnp.take(c2f, jnp.maximum(best_s, 0)), -1)

    # --- exactness residual: still-marching and aborted rays re-trace
    # the full tree (their best-so-far tightens the window).
    live = (cell != -1) & (idx < n)
    hr = trace_packets(
        flat, Rays(origin=jnp.stack([ox, oy, ozz], axis=1),
                   direction=jnp.stack([dxx, dyy, dzz], axis=1),
                   min_t=mint, max_t=jnp.where(live, best_t, 0.0)),
        mode=mode, watertight=watertight, interpret=interpret,
        dual=not interpret, sort_rays=True, filter_mask=filter_mask)
    ri = hr.slot >= 0
    best_t = jnp.where(ri, hr.t, best_t)
    best_s = jnp.where(ri, hr.slot, best_s)

    idx, best_t, best_s = jax.lax.sort(
        (idx, best_t, best_s), num_keys=1)
    best_t, best_s = best_t[:n], best_s[:n]

    # u/v were not carried through the rounds (two fewer grouping-sort
    # operands); recover them with ONE single-triangle re-test of each
    # final winner — same shear-space math as the kernel (intersect.py),
    # so the records match the flat engine's bit-near.
    from rtk_tpu.ops.intersect import intersect_triangles, ray_shear

    hitm = best_s >= 0
    tri = jnp.take(flat.tri_v, jnp.maximum(best_s, 0), axis=0)
    _, ru, rv, _ = intersect_triangles(
        o[:n], ray_shear(d[:n]), tri[:, None], mint0[:n],
        jnp.full((n,), _BIG), watertight=watertight)
    best_u = jnp.where(hitm, ru[:, 0], 0.0)
    best_v = jnp.where(hitm, rv[:, 0], 0.0)

    out = (best_t, best_u, best_v, best_s)
    if debug_counts:
        return out + (cnts, jnp.sum(live.astype(jnp.int32)))
    return out


@functools.lru_cache(maxsize=None)
def _grid_jit(tpu: bool, dims, n_occ, unit, rounds, skips, caps, mode,
              watertight, interpret, n, filter_mask,
              debug_counts=False, lesion="", sort_mode="multi"):
    opts = {"xla_tpu_scoped_vmem_limit_kib": 120 * 1024} if tpu else None
    return jax.jit(
        functools.partial(_grid_impl, dims=dims, n_occ=n_occ, unit=unit,
                          rounds=rounds, skips=skips, caps=caps,
                          mode=mode, watertight=watertight,
                          interpret=interpret, n=n,
                          filter_mask=filter_mask,
                          debug_counts=debug_counts, lesion=lesion,
                          sort_mode=sort_mode),
        compiler_options=opts)


def build_grid_from_scene(scene: Scene, packed: PackedScene | None = None,
                          **kw) -> GridScene:
    """Build the macro-grid structure from an already-built Scene,
    reusing its packed tables as the exact-fallback path (no second
    LBVH build of the same soup).  kw accepts build_grid options
    (dims, tri_mask, ...); a caller-supplied `packed` must carry the
    same tri_mask."""
    perm = np.asarray(scene.perm, np.int64)
    valid = perm >= 0
    T = scene.num_tris
    pos = np.empty((T, 3, 3), np.float32)
    vidx = np.empty((T, 3), np.int32)
    mesh = np.empty((T,), np.int32)
    prim = np.empty((T,), np.int32)
    pos[perm[valid]] = np.asarray(scene.tri_v)[valid]
    vidx[perm[valid]] = np.asarray(scene.tri_vidx)[valid]
    mesh[perm[valid]] = np.asarray(scene.tri_mesh)[valid]
    prim[perm[valid]] = np.asarray(scene.tri_prim)[valid]
    cfg = BuildConfig(branching=scene.branching, leaf_size=scene.leaf_size)
    if packed is None:
        packed = pack_scene(scene)
    return build_grid(pos, vidx, mesh, prim, config=cfg, flat=packed,
                      scene=scene, **kw)


def calibrate_caps(grid: GridScene, sample: Rays, rounds: int = 8,
                   skips: int = 3, unit: int = 128, slack: float = 1.15,
                   **kw) -> tuple:
    """Derive a shrinking per-round capacity schedule from one profiled
    trace of a representative batch.

    Round r's grouping sort places marching rays (and the pads that fill
    their cells to whole packets) ahead of retired rays, so round r+1
    only needs ``marching_r * slack + n_occ * unit`` rows of prefix.
    Rays a too-small cap strands are aborted into the exactness residual
    (never dropped), so a stale calibration costs speed, not accuracy.
    Use on a sample of the workload class (e.g. one bounce batch), then
    pass the result as ``caps=`` for subsequent batches.
    """
    _, (cnts, _) = trace_packets_grid(grid, sample, rounds=rounds,
                                      skips=skips, unit=unit,
                                      debug_counts=True, **kw)
    marching = np.asarray(cnts)[:, 1]
    pad = grid.n_occ * unit
    return tuple([2 ** 31 - 1]
                 + [int(m * slack) + pad for m in marching[:-1]])


def trace_packets_grid(
    grid: GridScene,
    rays: Rays,
    mode: str = "closest",
    watertight: bool = True,
    interpret: bool = False,
    rounds: int = 10,
    skips: int = 3,
    unit: int = 128,
    caps=None,
    filter_mask: int | None = None,
    debug_counts: bool = False,
    lesion: str = "",
    sort_mode: str = "multi",
) -> PacketHits:
    """Trace an incoherent ray batch by marching the macro-grid.

    Same hit-record contract as trace_packets.  Exact: rays still
    marching after `rounds` grid rounds finish on the full tree.
    debug_counts: also return ((rounds, 3) [kernel-live rows, marching
    after, aborted], residual-live count) for tuning round budgets.
    """
    n = rays.count
    blk = 8 * unit
    npad = grid.n_occ * unit
    M = (n + npad + blk - 1) // blk * blk
    extra = M - n

    def padded(a, fill):
        a = jnp.asarray(a)
        return jnp.concatenate(
            [a, jnp.full((extra,) + a.shape[1:], fill, a.dtype)])

    if caps is None:
        caps = (M,) * rounds
    else:
        caps = tuple(min((int(c) + blk - 1) // blk * blk, M) for c in caps)
        caps = caps + (caps[-1],) * (rounds - len(caps))
    idx = jnp.arange(M, dtype=jnp.uint32)

    fn = _grid_jit(jax.default_backend() == "tpu", grid.dims, grid.n_occ,
                   unit, rounds, skips, caps, mode, watertight, interpret,
                   n, None if filter_mask is None else int(filter_mask),
                   debug_counts, lesion, sort_mode)
    out = fn(
        (grid.cells, grid.flat, grid.rank, grid.cells_to_flat,
         grid.grid_lo, grid.cell_size),
        padded(rays.origin, 0.0), padded(rays.direction, 1.0),
        padded(rays.min_t, 0.0), padded(rays.max_t, 0.0), idx)
    t, u, v, slot = out[:4]
    dbg = out[4:] if debug_counts else None
    hits = PacketHits(
        hit=slot >= 0,
        t=t,
        u_k=u,
        v_k=v,
        slot=slot,
        origin=jnp.asarray(rays.origin),
        direction=jnp.asarray(rays.direction),
        tri_v=grid.flat.tri_v,
        tri_vidx=grid.flat.tri_vidx,
        tri_mesh=grid.flat.tri_mesh,
        tri_prim=grid.flat.tri_prim,
    )
    if debug_counts:
        return hits, dbg
    return hits


# ---------------------------------------------------------------------------
# Fused march: the WHOLE DDA loop inside ONE packet-kernel dispatch
# (VERDICT r3 item 4 — "fuse the re-binning INTO the kernel").
# ---------------------------------------------------------------------------

def _march_impl(grid_arrays, o, d, mint, maxt, *, march, mode, watertight,
                interpret, n, pkt, filter_mask):
    """One fused program: entry-cell grouping sort -> ONE march-kernel
    dispatch (packets adopt cells in-kernel as their subtrees drain) ->
    unsort -> record unification onto the flat tables.

    Replaces the rounds engine's per-round host-visible machinery (one
    grouping sort + one dispatch + one scatter PER ROUND, whose fixed
    cost cancelled the 3.3x row saving — PERF_NOTES r2 grid verdict).
    """
    from rtk_tpu.ops.pallas_trace import trace_packets

    cells_march, flat, m2f = grid_arrays
    dx_, dy_, dz_ = march[0], march[1], march[2]
    glo = march[3:6]
    cs = march[6:9]
    M = o.shape[0]

    # Entry cell per ray (same init math as the kernel's) — the one-time
    # grouping key; rays missing the grid sort to the back.
    ox, oy, ozz = o[:, 0], o[:, 1], o[:, 2]
    rcp = [_crcp(d[:, a]) for a in range(3)]
    near = jnp.full((M,), -_BIG)
    far = jnp.full((M,), _BIG)
    for a, oc in enumerate((ox, oy, ozz)):
        t0 = (glo[a] - oc) * rcp[a]
        t1 = (glo[a] + cs[a] * march[a] - oc) * rcp[a]
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    s0 = jnp.maximum(near, 0.0)
    miss = (near > far) | (far < 0.0) | (maxt <= mint)
    cell = jnp.zeros((M,), jnp.int32)
    for a, (oc, dims_a) in enumerate(zip((ox, oy, ozz), (dx_, dy_, dz_))):
        pa = oc + d[:, a] * s0
        ia = jnp.clip(jnp.floor((pa - glo[a]) / cs[a]).astype(jnp.int32),
                      0, dims_a - 1)
        cell = cell * dims_a + ia
    # Group by (entry cell, direction octant): packet members then march
    # SIMILAR cell chains, which bounds each packet's distinct-cell count
    # (the fused march visits every pending cell of its rays one at a
    # time — chain coherence is what keeps that set small).
    octant = ((d[:, 0] >= 0).astype(jnp.uint32) * 4
              + (d[:, 1] >= 0).astype(jnp.uint32) * 2
              + (d[:, 2] >= 0).astype(jnp.uint32))
    key = jnp.where(miss, jnp.uint32(0xFFFFFFFF),
                    (cell.astype(jnp.uint32) << jnp.uint32(3)) | octant)
    idx = jnp.arange(M, dtype=jnp.uint32)
    (key, idx, ox, oy, ozz, dxx, dyy, dzz, mint_s, maxt_s) = jax.lax.sort(
        (key, idx, ox, oy, ozz, d[:, 0], d[:, 1], d[:, 2], mint, maxt),
        num_keys=1)
    rs = Rays(origin=jnp.stack([ox, oy, ozz], axis=1),
              direction=jnp.stack([dxx, dyy, dzz], axis=1),
              min_t=mint_s, max_t=maxt_s)
    h = trace_packets(cells_march, rs, mode=mode, watertight=watertight,
                      interpret=interpret, pkt=pkt, sort_rays=False,
                      march=march, filter_mask=filter_mask)
    slot = jnp.where(h.slot >= 0, jnp.take(m2f, jnp.maximum(h.slot, 0)),
                     -1)
    _, t, u, v, slot = jax.lax.sort((idx, h.t, h.u, h.v, slot), num_keys=1)
    return t[:n], u[:n], v[:n], slot[:n]


@functools.lru_cache(maxsize=None)
def _march_jit(tpu: bool, march, mode, watertight, interpret, n, pkt,
               filter_mask):
    opts = {"xla_tpu_scoped_vmem_limit_kib": 120 * 1024} if tpu else None
    return jax.jit(
        functools.partial(_march_impl, march=march, mode=mode,
                          watertight=watertight, interpret=interpret,
                          n=n, pkt=pkt, filter_mask=filter_mask),
        compiler_options=opts)


def trace_packets_march(
    grid: GridScene,
    rays: Rays,
    mode: str = "closest",
    watertight: bool = True,
    interpret: bool = False,
    pkt: int = 512,
    filter_mask: int | None = None,
) -> PacketHits:
    """Trace an incoherent ray batch with the fused in-kernel grid march.

    Needs build_grid(march=True) (a per-cell-root forest pack).  Same
    hit-record contract as trace_packets; exact by construction — every
    ray traverses its own full cell chain until its best hit precedes
    the current cell's exit, with no round/capacity budget to overflow
    (the rounds engine's abort-to-residual machinery disappears).
    """
    if grid.cells_march is None:
        raise ValueError("trace_packets_march needs build_grid(march=True)")
    n = rays.count
    glo = np.asarray(grid.grid_lo, np.float64)
    cs = np.asarray(grid.cell_size, np.float64)
    march = (int(grid.dims[0]), int(grid.dims[1]), int(grid.dims[2]),
             float(glo[0]), float(glo[1]), float(glo[2]),
             float(cs[0]), float(cs[1]), float(cs[2]))
    blk = 8 * pkt
    M = (n + blk - 1) // blk * blk

    def padded(a, fill):
        a = jnp.asarray(a)
        pad = [(0, M - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad, constant_values=fill)

    fn = _march_jit(jax.default_backend() == "tpu", march, mode,
                    watertight, interpret, n, pkt,
                    None if filter_mask is None else int(filter_mask))
    t, u, v, slot = fn(
        (grid.cells_march, grid.flat, grid.march_to_flat),
        padded(rays.origin, 0.0), padded(rays.direction, 1.0),
        padded(rays.min_t, 0.0), padded(rays.max_t, 0.0))
    return PacketHits(
        hit=slot >= 0,
        t=t,
        u_k=u,
        v_k=v,
        slot=slot,
        origin=jnp.asarray(rays.origin),
        direction=jnp.asarray(rays.direction),
        tri_v=grid.flat.tri_v,
        tri_vidx=grid.flat.tri_vidx,
        tri_mesh=grid.flat.tri_mesh,
        tri_prim=grid.flat.tri_prim,
    )

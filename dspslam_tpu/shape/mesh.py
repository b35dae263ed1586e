"""Shape-code -> triangle mesh extraction.

Replaces the reference's MeshExtractor (/root/reference/reconstruct/
optimizer.py:206-223): decode the DeepSDF field on a voxel grid (on
device, chunked so one compilation serves any grid size) and run
isosurface extraction on host.

The isosurfacer is a from-scratch *marching tetrahedra* (the reference
uses skimage's marching-cubes Lewiner, utils.py:119-140, which is not
available here): each grid cube is split into 6 tetrahedra around the
0-6 diagonal; per-tet sign cases come from a programmatically built
16-case table, vertices are linearly interpolated on cut edges, and
triangle winding is oriented by the SDF gradient so normals point
outward. Vertices are welded. Produces the same zero-crossing surface
geometry as marching cubes with a slightly denser triangulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Device-side voxel grid decode

def create_voxel_grid(vol_dim: int = 64) -> np.ndarray:
    """(vol_dim^3, 3) query points on [-1, 1]^3, x slowest / z fastest —
    reshape(D, D, D) yields axes (x, y, z). Matches reference
    utils.py:97-116 layout."""
    lin = np.linspace(-1.0, 1.0, vol_dim, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.stack([x, y, z], axis=-1).reshape(-1, 3)


@partial(jax.jit, static_argnums=(0, 3))
def decode_sdf_grid(decoder_fn, decoder_params, code: jnp.ndarray, vol_dim: int):
    """SDF on a vol_dim^3 grid -> (vol_dim, vol_dim, vol_dim), chunked
    through the decoder (reference decode_sdf, loss_utils.py:51-79)."""
    pts = jnp.asarray(create_voxel_grid(vol_dim))
    L = code.shape[0]
    chunk = min(64**3, pts.shape[0])
    n = pts.shape[0]
    pad = (-n) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

    def eval_chunk(p):
        inp = jnp.concatenate([jnp.broadcast_to(code, (chunk, L)), p], axis=-1)
        return decoder_fn(decoder_params, inp)

    sdf = jax.lax.map(eval_chunk, pts_p).reshape(-1)[:n]
    return sdf.reshape(vol_dim, vol_dim, vol_dim)


def decode_sdf_grid_sharded(
    decoder_fn, decoder_params, code: jnp.ndarray, vol_dim: int, mesh
):
    """Multi-chip SDF grid decode: the vol_dim^3 query points shard over
    the mesh's 'dp' axis, so each device decodes one slab of the volume
    (the decoder weights ride along replicated or tensor-parallel — see
    parallel.mesh_utils.decoder_param_sharding); XLA inserts the final
    gather over ICI. The per-object mesh-extraction analogue of the
    reference's single-GPU decode_sdf chunking (loss_utils.py:51-79)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    pts = jnp.asarray(create_voxel_grid(vol_dim))
    n = pts.shape[0]
    dp = mesh.shape["dp"]
    pad = (-n) % dp
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    pts_sharded = jax.device_put(pts_p, NamedSharding(mesh, P("dp", None)))
    L = code.shape[0]

    @jax.jit
    def run(p, c):
        inp = jnp.concatenate(
            [jnp.broadcast_to(c, (p.shape[0], L)), p], axis=-1
        )
        return decoder_fn(decoder_params, inp)

    sdf = run(pts_sharded, jnp.asarray(code)[:L])[:n]
    return sdf.reshape(vol_dim, vol_dim, vol_dim)


# ---------------------------------------------------------------------------
# Host-side marching tetrahedra

# 6-tet decomposition of a cube around the 0-6 diagonal. Cube corners are
# indexed by binary (x, y, z) offsets: corner k = (k>>2 & 1, k>>1 & 1, k & 1).
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=np.int64
)
# corners 0 and 7 are the main diagonal (000 -> 111)
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
     [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], dtype=np.int64
)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)


def _build_tet_table() -> np.ndarray:
    """(16, 2, 3) triangle table: per sign-case, up to two triangles given
    as indices into _TET_EDGES; -1 padding."""
    edge_id = {frozenset(map(int, e)): i for i, e in enumerate(_TET_EDGES)}
    table = np.full((16, 2, 3), -1, dtype=np.int64)
    for case in range(1, 15):
        inside = [i for i in range(4) if case >> i & 1]
        outside = [i for i in range(4) if not case >> i & 1]
        if len(inside) == 1:
            v = inside[0]
            table[case, 0] = [edge_id[frozenset((v, o))] for o in outside]
        elif len(inside) == 3:
            v = outside[0]
            table[case, 0] = [edge_id[frozenset((v, i))] for i in inside]
        else:
            a, b = inside
            c, d = outside
            e_ac, e_ad = edge_id[frozenset((a, c))], edge_id[frozenset((a, d))]
            e_bc, e_bd = edge_id[frozenset((b, c))], edge_id[frozenset((b, d))]
            # quad perimeter AC -> AD -> BD -> BC, fanned from AC
            table[case, 0] = [e_ac, e_ad, e_bd]
            table[case, 1] = [e_ac, e_bd, e_bc]
    return table


_TET_TABLE = _build_tet_table()


def marching_tetrahedra(sdf: np.ndarray, level: float = 0.0):
    """Extract the `level` isosurface of a (D, D, D) scalar field.

    Returns (vertices (V, 3) float32 in [-1, 1]^3 grid coordinates,
    faces (F, 3) int32) with outward-oriented normals (toward sdf > level).
    """
    sdf = np.asarray(sdf, np.float32)
    D = sdf.shape[0]
    spacing = 2.0 / (D - 1)

    # all cube base indices
    base = np.stack(
        np.meshgrid(*([np.arange(D - 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)                                             # (C, 3)
    corner_idx = base[:, None, :] + _CUBE_CORNERS[None, :, :]     # (C, 8, 3)
    corner_val = sdf[
        corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]
    ]                                                             # (C, 8)

    verts_out = []
    for tet in _TETS:
        vals = corner_val[:, tet]                                 # (C, 4)
        pos = corner_idx[:, tet, :].astype(np.float32)            # (C, 4, 3)
        case = ((vals < level) << np.arange(4)).sum(axis=-1)      # (C,)
        active = (case > 0) & (case < 15)
        if not active.any():
            continue
        vals_a, pos_a, case_a = vals[active], pos[active], case[active]
        tris = _TET_TABLE[case_a]                                 # (A, 2, 3)
        for t in range(2):
            edge_ids = tris[:, t, :]                              # (A, 3)
            has_tri = edge_ids[:, 0] >= 0
            if not has_tri.any():
                continue
            e = edge_ids[has_tri]                                 # (M, 3)
            v4, p4 = vals_a[has_tri], pos_a[has_tri]
            ends = _TET_EDGES[e]                                  # (M, 3, 2)
            va = np.take_along_axis(v4, ends[..., 0], axis=1)     # (M, 3)
            vb = np.take_along_axis(v4, ends[..., 1], axis=1)
            ta = (level - va) / np.where(vb - va == 0, 1e-12, vb - va)
            ta = np.clip(ta, 0.0, 1.0)[..., None]
            pa = np.take_along_axis(p4, ends[..., 0][..., None], axis=1)
            pb = np.take_along_axis(p4, ends[..., 1][..., None], axis=1)
            verts_out.append(pa + ta * (pb - pa))                 # (M, 3, 3)

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tri_verts = np.concatenate(verts_out, axis=0)                 # (T, 3, 3)

    # orient windings by the field gradient at the triangle centroid
    grad = np.stack(np.gradient(sdf), axis=-1)                    # (D, D, D, 3)
    centroid = tri_verts.mean(axis=1)
    ci = np.clip(np.round(centroid).astype(np.int64), 0, D - 1)
    g = grad[ci[:, 0], ci[:, 1], ci[:, 2]]                        # (T, 3)
    n = np.cross(
        tri_verts[:, 1] - tri_verts[:, 0], tri_verts[:, 2] - tri_verts[:, 0]
    )
    flip = (n * g).sum(-1) < 0
    tri_verts[flip] = tri_verts[flip][:, ::-1, :]

    # weld vertices
    flat = tri_verts.reshape(-1, 3)
    keys = np.round(flat / spacing * 1024.0).astype(np.int64)
    _, first, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    vertices = flat[first]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces produced by welding
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # grid index space -> object coordinates in [-1, 1]^3
    vertices = vertices * spacing - 1.0
    return vertices.astype(np.float32), faces


class MeshExtractor:
    """Code -> mesh, mirroring the reference MeshExtractor API."""

    def __init__(self, decoder_fn, decoder_params, code_len: int = 64,
                 voxels_dim: int = 64, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'dp' axis — voxel
        queries shard across devices (decode_sdf_grid_sharded)."""
        self.decoder_fn = decoder_fn
        self.decoder_params = decoder_params
        self.code_len = code_len
        self.voxels_dim = voxels_dim
        self.mesh = mesh

    def dispatch(self, code):
        """Async half: launch the voxel-grid SDF decode and start
        streaming it back; marching tetrahedra (host) runs at collect().
        Lets callers move mesh extraction off latency-critical paths —
        nothing in the SLAM loop consumes the vertices."""
        code = jnp.asarray(code)[: self.code_len]
        if self.mesh is not None:
            sdf = decode_sdf_grid_sharded(
                self.decoder_fn, self.decoder_params, code,
                self.voxels_dim, self.mesh,
            )
        else:
            sdf = decode_sdf_grid(
                self.decoder_fn, self.decoder_params, code, self.voxels_dim
            )
        try:
            sdf.copy_to_host_async()
        except Exception:
            pass
        return sdf

    @staticmethod
    def collect(sdf_handle):
        vertices, faces = marching_tetrahedra(np.asarray(sdf_handle), 0.0)
        return {"vertices": vertices, "faces": faces}

    def extract_mesh_from_code(self, code):
        return self.collect(self.dispatch(code))

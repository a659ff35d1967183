#!/usr/bin/env python3
"""Offline mesh pipeline: Exodus -> XDMF/HDF5 + extraction-operator relabeling.

Capability parity with the reference's converter
(meshes/createSquareMeshes/mesh_convert.py), without meshio (not in this
environment): Exodus II files are read natively — netCDF3 variants via
scipy.io.netcdf_file, netCDF4 variants via h5py (netCDF4 *is* HDF5).

    python3 tools/mesh_convert.py --fi xtk_temp.exo --fo mesh.xdmf --CExOps True

Behavior mirrored from the reference:
* blocks are concatenated with a cell-wise 'material' attribute 1, 2, ...
  (mesh_convert.py:78-92);
* node ids are renumbered to be consecutive over the used nodes
  (makeIDsConsecutive, :29-57) — vectorized here;
* quadratic cells (triangle6 / tetra10): the full high-order connectivity is
  written to cell_nodes.csv, then cells are truncated to their linear
  vertices (:97-119);
* the z coordinate is pruned for 2D meshes (:122-125);
* --CExOps: foreground ids inside MORIS Global_Extraction_Operators.{0,1}.hdf5
  are mapped through the renumbering and written as ExOp_Cons.csv /
  ExOp_Cons_Both.csv / ExOp_Cons_zero.csv (:135-198).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_exodus(path: str):
    """Returns (points (n,3), [(elem_type, connect (nc, nv))...], 0-based)."""
    try:
        return _read_exodus_netcdf3(path)
    except Exception:
        return _read_exodus_hdf5(path)


def _assemble_coords(names: dict):
    if "coord" in names:
        coord = np.asarray(names["coord"], dtype=np.float64)
        pts = coord.T.copy()
    else:
        xs = np.asarray(names["coordx"], dtype=np.float64)
        ys = np.asarray(names.get("coordy", np.zeros_like(xs)))
        zs = np.asarray(names.get("coordz", np.zeros_like(xs)))
        pts = np.stack([xs, ys, zs], axis=1)
    if pts.shape[1] == 2:
        pts = np.hstack([pts, np.zeros((pts.shape[0], 1))])
    return pts


def _read_exodus_netcdf3(path: str):
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as f:
        var = {k: v[:] for k, v in f.variables.items()
               if k.startswith(("coord", "connect"))}
        attrs = {
            k: f.variables[k].elem_type.decode()
            if hasattr(f.variables[k], "elem_type") else ""
            for k in f.variables if k.startswith("connect")
        }
    points = _assemble_coords(var)
    blocks = []
    b = 1
    while f"connect{b}" in var:
        conn = np.asarray(var[f"connect{b}"], dtype=np.int64) - 1  # 1-based
        blocks.append((attrs.get(f"connect{b}", "").lower(), conn))
        b += 1
    return points, blocks


def _read_exodus_hdf5(path: str):
    import h5py

    with h5py.File(path, "r") as f:
        var = {
            k: np.array(f[k]) for k in f.keys()
            if k.startswith(("coord", "connect"))
        }
        attrs = {}
        for k in f.keys():
            if k.startswith("connect"):
                et = f[k].attrs.get("elem_type", b"")
                attrs[k] = (et.decode() if isinstance(et, bytes) else str(et)).lower()
    points = _assemble_coords(var)
    blocks = []
    b = 1
    while f"connect{b}" in var:
        blocks.append((attrs.get(f"connect{b}", ""),
                       np.asarray(var[f"connect{b}"], dtype=np.int64) - 1))
        b += 1
    return points, blocks


def make_ids_consecutive(cells: np.ndarray, points: np.ndarray):
    """Vectorized makeIDsConsecutive (mesh_convert.py:29-57)."""
    used = np.unique(cells.ravel())
    old2new = np.full(int(used.max()) + 1, -1, dtype=np.int64)
    old2new[used] = np.arange(len(used))
    return old2new[cells], points[used], old2new


def infer_cell_type(nv: int, blocks_type: str) -> str:
    """Normalize Exodus elem_type names (TRI3/TRI6/TET4/TETRA10/...) to the
    meshio-style names the reference logic switches on."""
    by_nv = {3: "triangle", 4: "tetra4", 6: "triangle6", 10: "tetra10"}
    t = (blocks_type or "").lower()
    if t.startswith("tri"):
        return "triangle6" if nv == 6 else "triangle"
    if t.startswith("tet"):
        return "tetra10" if nv == 10 else "tetra4"
    return by_nv[nv]


def write_xdmf(path: str, points: np.ndarray, cells: np.ndarray,
               materials: np.ndarray):
    """Write the reference's XDMF layout: mesh.h5 data0/1/2 + XML index."""
    import h5py

    base = os.path.dirname(os.path.abspath(path))
    h5name = os.path.splitext(os.path.basename(path))[0] + ".h5"
    with h5py.File(os.path.join(base, h5name), "w") as f:
        f.create_dataset("data0", data=points.astype(np.float64))
        f.create_dataset("data1", data=cells.astype(np.int32))
        f.create_dataset("data2", data=materials.astype(np.float64))
    dim = points.shape[1]
    topo = "Triangle" if cells.shape[1] == 3 else "Tetrahedron"
    geom = "XY" if dim == 2 else "XYZ"
    xml = (
        f'<Xdmf Version="3.0"><Domain><Grid Name="Grid">'
        f'<Geometry GeometryType="{geom}"><DataItem DataType="Float" '
        f'Dimensions="{points.shape[0]} {dim}" Format="HDF" Precision="8">'
        f'{h5name}:/data0</DataItem></Geometry>'
        f'<Topology TopologyType="{topo}" NumberOfElements="{cells.shape[0]}" '
        f'NodesPerElement="{cells.shape[1]}"><DataItem DataType="Int" '
        f'Dimensions="{cells.shape[0]} {cells.shape[1]}" Format="HDF" '
        f'Precision="4">{h5name}:/data1</DataItem></Topology>'
        f'<Attribute Name="material" AttributeType="Scalar" Center="Cell">'
        f'<DataItem DataType="Float" Dimensions="{cells.shape[0]}" '
        f'Format="HDF" Precision="8">{h5name}:/data2</DataItem></Attribute>'
        f'</Grid></Domain></Xdmf>'
    )
    with open(path, "w") as f:
        f.write(xml)


def relabel_exops(old2new: np.ndarray, out_dir: str = "."):
    """--CExOps path (mesh_convert.py:135-198), vectorized."""
    import h5py

    def load(fn):
        with h5py.File(fn, "r") as f:
            keys = list(f.keys())
            return np.array(f[keys[0]]), np.array(f[keys[1]])

    def relabel(indices):
        idx = indices.copy().astype(np.int64)
        idx[:, 0] = old2new[idx[:, 0] - 1] + 1
        return idx

    def save(name, indices, weights):
        data = np.concatenate(
            [relabel(indices).astype(np.float64), weights], axis=1
        )
        np.savetxt(os.path.join(out_dir, name), data, fmt="%d %d %1.16f")

    i1, w1 = load("Global_Extraction_Operators.1.hdf5")
    save("ExOp_Cons.csv", i1, w1)
    i0, w0 = load("Global_Extraction_Operators.0.hdf5")
    save("ExOp_Cons_Both.csv", np.concatenate([i0, i1]),
         np.concatenate([w0, w1]))
    save("ExOp_Cons_zero.csv", i0, w0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--fi', dest='fi', default="xtk_temp.exo",
                        help='Input mesh file')
    parser.add_argument('--fo', dest='fo', default="mesh.xdmf",
                        help='Output mesh file')
    parser.add_argument('--CExOps', dest='CExOps', default=False,
                        help='Convert Extraction Operators, T/F')
    args = parser.parse_args()

    print(">>> Reading the mesh file...")
    points, blocks = read_exodus(args.fi)
    print(">>> Creating material data ...")
    cells = np.concatenate([c for _, c in blocks], axis=0)
    materials = np.concatenate(
        [np.full(len(c), b + 1) for b, (_, c) in enumerate(blocks)]
    )
    cell_type = infer_cell_type(cells.shape[1], blocks[-1][0])

    print(">>> Making IDS consecutive")
    cells, points, old2new = make_ids_consecutive(cells, points)

    if cell_type.startswith(("triangle6", "tetra10")):
        # write full high-order connectivity, truncate to the linear corner
        # nodes; corner ids must be contiguous from 0 (Exodus numbers corner
        # nodes first — the reference's trimHOPoints relies on this too)
        print(">>> Making high order node mesh")
        np.savetxt("cell_nodes.csv", cells, fmt="%d", delimiter=",")
        nv = 3 if cell_type.startswith("triangle") else 4
        cells = cells[:, :nv]
        used = np.unique(cells.ravel())
        assert used[0] == 0 and used[-1] == len(used) - 1, \
            "corner nodes are not numbered first in this Exodus file"
        points = points[: len(used)]

    if cell_type.startswith("triangle"):
        print(">>> pruneing z coord")
        points = points[:, :2]

    print(">>> Writing the mesh file...")
    write_xdmf(args.fo, points, cells, materials)

    if str(args.CExOps) not in ("False", "false", "0", ""):
        print(">>> Relabeling nodeIDs in extraction operators...")
        relabel_exops(old2new)


if __name__ == "__main__":
    main()

"""Minimal VTI/VTU readers shared by the post-processing scripts.

Handles both encodings the framework writes: ASCII (reference-compatible)
and VTK XML appended-raw binary (cfg.vtk_binary=1).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

_VTK_DTYPES = {
    "Float64": np.float64, "Float32": np.float32,
    "Int32": np.int32, "Int64": np.int64, "UInt8": np.uint8,
}


def _appended_blob(path):
    """Raw appended payload (bytes after the '_' marker), or None."""
    with open(path, "rb") as f:
        data = f.read()
    tag = data.find(b'<AppendedData encoding="raw">')
    if tag < 0:
        return None
    start = data.index(b"_", tag) + 1
    end = data.rfind(b"</AppendedData>")
    return data[start:end]


def _parse_root(path):
    """ElementTree root tolerant of the raw binary payload (not valid XML)."""
    with open(path, "rb") as f:
        data = f.read()
    tag = data.find(b'<AppendedData encoding="raw">')
    if tag < 0:
        return ET.fromstring(data)
    trimmed = data[:tag] + b"</VTKFile>\n"
    return ET.fromstring(trimmed)


def read_vti(path):
    """Return (meta, fields) for a VTI ImageData file (ASCII or appended-raw).

    meta: dict with nx, ny, nz, origin, spacing, x, y (flat node coords).
    fields: dict name -> array [N] or [N, ncomp].
    """
    root = _parse_root(path)
    blob = _appended_blob(path)
    img = root.find(".//ImageData")
    ext = [int(v) for v in img.get("WholeExtent").split()]
    origin = [float(v) for v in img.get("Origin").split()]
    spacing = [float(v) for v in img.get("Spacing").split()]
    nx = ext[1] - ext[0] + 1
    ny = ext[3] - ext[2] + 1
    nz = ext[5] - ext[4] + 1
    N = nx * ny * nz

    ii = np.arange(N) % nx
    jj = (np.arange(N) // nx) % ny
    kk = np.arange(N) // (nx * ny)
    x = origin[0] + ii * spacing[0]
    y = origin[1] + jj * spacing[1]
    z = origin[2] + kk * spacing[2]

    fields = {}
    for da in root.findall(".//DataArray"):
        name = da.get("Name")
        if name is None:
            continue
        ncomp = int(da.get("NumberOfComponents", "1"))
        if da.get("format") == "appended":
            off = int(da.get("offset"))
            nbytes = int(np.frombuffer(blob, np.uint64, 1, off)[0])
            vals = np.frombuffer(blob, _VTK_DTYPES[da.get("type")],
                                 count=nbytes // np.dtype(
                                     _VTK_DTYPES[da.get("type")]).itemsize,
                                 offset=off + 8).astype(np.float64)
        elif da.text is not None:
            vals = np.fromstring(" ".join(da.text.split()), sep=" ")
        else:
            continue
        fields[name] = vals.reshape(N, ncomp) if ncomp > 1 else vals

    meta = dict(nx=nx, ny=ny, nz=nz, origin=origin, spacing=spacing,
                x=x, y=y, z=z)
    return meta, fields


def read_vtu(path):
    """Return (points [N,3], fields) for an ASCII VTU file."""
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    n = int(piece.get("NumberOfPoints"))
    pts_da = piece.find("Points/DataArray")
    pts = np.fromstring(" ".join(pts_da.text.split()), sep=" ").reshape(n, 3)
    fields = {}
    for da in piece.find("PointData").findall("DataArray"):
        name = da.get("Name")
        ncomp = int(da.get("NumberOfComponents", "1"))
        vals = np.fromstring(" ".join(da.text.split()), sep=" ")
        fields[name] = vals.reshape(n, ncomp) if ncomp > 1 else vals
    return pts, fields

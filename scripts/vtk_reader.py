"""Minimal ASCII VTI/VTU readers shared by the post-processing scripts."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np


def read_vti(path):
    """Return (meta, fields) for an ASCII VTI ImageData file.

    meta: dict with nx, ny, nz, origin, spacing, x, y (flat node coords).
    fields: dict name -> array [N] or [N, ncomp].
    """
    root = ET.parse(path).getroot()
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
        if name is None or da.text is None:
            continue
        ncomp = int(da.get("NumberOfComponents", "1"))
        vals = np.fromstring(" ".join(da.text.split()), sep=" ")
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

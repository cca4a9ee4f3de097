"""VTK output: ASCII VTI (ImageData), VTU (UnstructuredGrid), crash-safe PVD.

Format-compatible rewrite of the reference VTKWriter (src/vtk_writer.cpp):
same 10 point-data arrays in the same order/names (velocity, pressure,
density, concentration, phase, node_type, grain_id, D_map,
is_grain_boundary, is_precipitate), WALL/OUTSIDE velocity zeroed for
visualization, NaN audit with warning, subnormal flush, and the PVD
collection rewritten after every snapshot so a killed run leaves a loadable
time series (vtk_writer.cpp:148-158).
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np


def _safe(a: np.ndarray) -> np.ndarray:
    """NaN/inf -> 0 and subnormal flush (vtk_writer.cpp:8-14)."""
    a = np.where(np.isfinite(a), a, 0.0)
    return np.where((a != 0.0) & (np.abs(a) < 1e-300), 0.0, a)


def _fmt_block(out, arr, fmt="%.9g"):
    """Write one value per line with the reference's indentation.

    Hot path — serialized by the native C library when available
    (native/pdcorr_native.cpp), with a pure-Python fallback."""
    from . import native

    flat = np.asarray(arr).ravel()
    if fmt == "%d":
        out.write(native.fmt_int_block(flat.astype(np.int64)))
    else:
        out.write(native.fmt_scalar_block(flat.astype(np.float64)))


def _fmt_vec_block(out, arr3, fmt="%.9g"):
    from . import native

    out.write(native.fmt_vec3_block(np.asarray(arr3, np.float64)))


def _nan_audit(state, filename):
    n = int(np.isnan(np.asarray(state.vel)).any(axis=-1).sum())
    n += int((np.isnan(np.asarray(state.rho)) | np.isnan(np.asarray(state.C))
              | np.isnan(np.asarray(state.pressure))).sum())
    if n > 0:
        print(f"WARNING: {n} NaN values detected when writing {filename}",
              file=sys.stderr)


class VTKWriter:
    def __init__(self):
        self._pvd_path = ""
        self._entries: list[tuple[float, str]] = []
        self._pending = None   # at most one in-flight background write
        self._bg_err = None

    # ------------------------------------------------------------------
    def flush(self) -> None:
        """Join the in-flight background VTI write (binary mode overlaps
        serialization + disk write with device compute; checkpoints and
        run exit must not outrun the snapshot files they reference)."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._bg_err is not None:
            err, self._bg_err = self._bg_err, None
            raise err

    # ------------------------------------------------------------------
    def write(self, filename: str, grid, state, cfg) -> None:
        """VTI ImageData. Default: ASCII, byte-compatible with the
        reference (vtk_writer.cpp:16-146). cfg.vtk_binary=1 switches to
        the VTK XML appended-raw encoding — same arrays/names/order, ~6x
        smaller and ~50x faster to serialize (an ASCII 1M-node VTI is
        ~130MB and minutes of host formatting per snapshot)."""
        if getattr(cfg, "vtk_binary", 0):
            return self._write_binary(filename, grid, state, cfg)
        return self._write_ascii(filename, grid, state, cfg)

    def _vti_arrays(self, grid, state, filename=None):
        """(name, dtype-tag, data) tuples in the reference's array order.

        The float fields cross device->host as ONE packed array (and the
        uint8 flags as a second): under the axon TPU relay each transfer
        is a full round trip, and the previous ten separate np.asarray
        calls (plus four more in the NaN audit) cost ~2.5 s/snapshot at
        1M nodes. The pack keeps the state's own float dtype, so the
        serialized float64 payload is bit-identical to the per-array
        fetch path. The NaN audit (same positions-counting semantics as
        _nan_audit) runs on the fetched pack when ``filename`` is given.
        """
        import jax.numpy as jnp

        dim = grid.dim
        n = state.rho.size
        fpack = np.asarray(jnp.concatenate(
            [jnp.reshape(state.vel, (n, dim))]
            + [jnp.reshape(a, (n, 1)) for a in
               (state.pressure, state.rho, state.C, state.D_map)],
            axis=1), np.float64)
        upack = np.asarray(jnp.stack(
            [jnp.reshape(jnp.asarray(a), (n,)) for a in
             (state.phase, state.node_type, state.is_gb, state.is_precip)],
            axis=1).astype(jnp.uint8))
        gid = np.asarray(state.grain_id, np.int32).reshape(n)

        if filename is not None:
            n_nan = int(np.isnan(fpack[:, :dim]).any(axis=1).sum())
            n_nan += int(np.isnan(fpack[:, dim:dim + 3]).any(axis=1).sum())
            if n_nan > 0:
                print(f"WARNING: {n_nan} NaN values detected when writing "
                      f"{filename}", file=sys.stderr)

        nt = upack[:, 1]
        fictitious = (nt == 2) | (nt == 5)  # WALL | OUTSIDE zeroed for viz
        vel3 = np.zeros((n, 3))
        vel3[:, :dim] = _safe(fpack[:, :dim])
        vel3[fictitious] = 0.0
        return [
            ("velocity", "Float64", vel3),
            ("pressure", "Float64", _safe(fpack[:, dim])),
            ("density", "Float64", _safe(fpack[:, dim + 1])),
            ("concentration", "Float64", _safe(fpack[:, dim + 2])),
            ("phase", "UInt8", upack[:, 0]),
            ("node_type", "UInt8", nt),
            ("grain_id", "Int32", gid),
            ("D_map", "Float64", _safe(fpack[:, dim + 3])),
            ("is_grain_boundary", "UInt8", upack[:, 2]),
            ("is_precipitate", "UInt8", upack[:, 3]),
        ]

    def _write_binary(self, filename: str, grid, state, cfg) -> None:
        """VTK XML ImageData with appended raw binary payload.

        The device->host fetch (_vti_arrays) is synchronous; the ~90 MB
        of host serialization + disk write runs on a background thread,
        overlapped with the next device launch (at 1M nodes it is
        ~1.5-2 s/snapshot of pure host work, 46+ snapshots per flagship
        run). flush() joins it; at most one write is in flight."""
        import threading

        self.flush()
        arrays = self._vti_arrays(grid, state, filename)
        dim = grid.dim
        dims = (grid.Nx, grid.Ny, grid.Nz if dim == 3 else 1)
        origin = (grid.origin[0], grid.origin[1],
                  grid.origin[2] if dim == 3 else 0.0)

        def bg():
            try:
                self._serialize_binary(filename, dims, origin, grid.dx,
                                       arrays)
            except BaseException as e:  # surfaced by the next flush()
                self._bg_err = e

        th = threading.Thread(target=bg, daemon=True)
        th.start()
        self._pending = th

    def _serialize_binary(self, filename, dims, origin, dx, arrays) -> None:
        nx, ny, nz = dims

        head = io.StringIO()
        head.write('<?xml version="1.0"?>\n')
        head.write('<VTKFile type="ImageData" version="1.0" '
                   'byte_order="LittleEndian" header_type="UInt64">\n')
        head.write(
            f'  <ImageData WholeExtent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"'
            f' Origin="{origin[0]:g} {origin[1]:g} {origin[2]:g}"'
            f' Spacing="{dx:g} {dx:g} {dx:g}">\n')
        head.write(f'    <Piece Extent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}">\n')
        head.write('      <PointData Scalars="phase" Vectors="velocity">\n')
        offset = 0
        payload = []
        for name, tag, data in arrays:
            ncomp = data.shape[1] if data.ndim > 1 else 1
            comp = f' NumberOfComponents="{ncomp}"' if ncomp > 1 else ""
            head.write(f'        <DataArray type="{tag}" Name="{name}"{comp} '
                       f'format="appended" offset="{offset}"/>\n')
            raw = np.ascontiguousarray(data).tobytes()
            payload.append(np.uint64(len(raw)).tobytes())
            payload.append(raw)
            offset += 8 + len(raw)
        head.write("      </PointData>\n    </Piece>\n  </ImageData>\n")
        head.write('  <AppendedData encoding="raw">\n_')
        with open(filename, "wb") as f:
            f.write(head.getvalue().encode())
            for chunk in payload:
                f.write(chunk)
            f.write(b"\n  </AppendedData>\n</VTKFile>\n")

    def _write_ascii(self, filename: str, grid, state, cfg) -> None:
        """ASCII VTI ImageData (vtk_writer.cpp:16-146)."""
        _nan_audit(state, filename)
        dim = grid.dim
        nx, ny = grid.Nx, grid.Ny
        nz = grid.Nz if dim == 3 else 1
        oz = grid.origin[2] if dim == 3 else 0.0

        nt = np.asarray(state.node_type).ravel()
        fictitious = (nt == 2) | (nt == 5)  # WALL | OUTSIDE zeroed for viz

        vel = np.asarray(state.vel).reshape(-1, dim).astype(np.float64)
        vel3 = np.zeros((vel.shape[0], 3))
        vel3[:, :dim] = _safe(vel)
        vel3[fictitious] = 0.0

        out = io.StringIO()
        out.write('<?xml version="1.0"?>\n')
        out.write('<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian">\n')
        out.write(
            f'  <ImageData WholeExtent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"'
            f' Origin="{grid.origin[0]:g} {grid.origin[1]:g} {oz:g}"'
            f' Spacing="{grid.dx:g} {grid.dx:g} {grid.dx:g}">\n'
        )
        out.write(f'    <Piece Extent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}">\n')
        out.write('      <PointData Scalars="phase" Vectors="velocity">\n')

        out.write('        <DataArray type="Float64" Name="velocity" '
                  'NumberOfComponents="3" format="ascii">\n')
        _fmt_vec_block(out, vel3)
        out.write("        </DataArray>\n")

        for name, data in (
            ("pressure", _safe(np.asarray(state.pressure, np.float64))),
            ("density", _safe(np.asarray(state.rho, np.float64))),
            ("concentration", _safe(np.asarray(state.C, np.float64))),
        ):
            out.write(f'        <DataArray type="Float64" Name="{name}" format="ascii">\n')
            _fmt_block(out, data)
            out.write("        </DataArray>\n")

        for name, data in (
            ("phase", np.asarray(state.phase)),
            ("node_type", nt),
        ):
            out.write(f'        <DataArray type="UInt8" Name="{name}" format="ascii">\n')
            _fmt_block(out, data, fmt="%d")
            out.write("        </DataArray>\n")

        out.write('        <DataArray type="Int32" Name="grain_id" format="ascii">\n')
        _fmt_block(out, np.asarray(state.grain_id), fmt="%d")
        out.write("        </DataArray>\n")

        out.write('        <DataArray type="Float64" Name="D_map" format="ascii">\n')
        _fmt_block(out, _safe(np.asarray(state.D_map, np.float64)))
        out.write("        </DataArray>\n")

        for name, data in (
            ("is_grain_boundary", np.asarray(state.is_gb).astype(np.uint8)),
            ("is_precipitate", np.asarray(state.is_precip).astype(np.uint8)),
        ):
            out.write(f'        <DataArray type="UInt8" Name="{name}" format="ascii">\n')
            _fmt_block(out, data, fmt="%d")
            out.write("        </DataArray>\n")

        out.write("      </PointData>\n")
        out.write("    </Piece>\n")
        out.write("  </ImageData>\n")
        out.write("</VTKFile>\n")

        with open(filename, "w") as f:
            f.write(out.getvalue())

    # ------------------------------------------------------------------
    def write_vtu(self, filename: str, grid, state, cfg) -> None:
        """ASCII VTU for unstructured/AMR grids (vtk_writer.cpp:199-346):
        one VTK_VERTEX cell per node, OUTSIDE nodes filtered out."""
        _nan_audit(state, filename)
        dim = grid.dim
        nt = np.asarray(state.node_type).ravel()
        keep = nt != 5  # OUTSIDE
        idx = np.flatnonzero(keep)
        n_out = idx.size

        pos = grid.pos.reshape(-1, dim)[idx]
        pos3 = np.zeros((n_out, 3))
        pos3[:, :dim] = pos

        vel = np.asarray(state.vel).reshape(-1, dim)[idx]
        vel3 = np.zeros((n_out, 3))
        vel3[:, :dim] = _safe(vel)
        vel3[nt[idx] == 2] = 0.0  # WALL zeroed

        out = io.StringIO()
        out.write('<?xml version="1.0"?>\n')
        out.write('<VTKFile type="UnstructuredGrid" version="1.0" byte_order="LittleEndian">\n')
        out.write("  <UnstructuredGrid>\n")
        out.write(f'    <Piece NumberOfPoints="{n_out}" NumberOfCells="{n_out}">\n')
        out.write("      <Points>\n")
        out.write('        <DataArray type="Float64" NumberOfComponents="3" format="ascii">\n')
        _fmt_vec_block(out, pos3)
        out.write("        </DataArray>\n      </Points>\n")
        out.write("      <Cells>\n")
        out.write('        <DataArray type="Int32" Name="connectivity" format="ascii">\n')
        _fmt_block(out, np.arange(n_out), fmt="%d")
        out.write("        </DataArray>\n")
        out.write('        <DataArray type="Int32" Name="offsets" format="ascii">\n')
        _fmt_block(out, np.arange(1, n_out + 1), fmt="%d")
        out.write("        </DataArray>\n")
        out.write('        <DataArray type="UInt8" Name="types" format="ascii">\n')
        _fmt_block(out, np.ones(n_out, np.uint8), fmt="%d")
        out.write("        </DataArray>\n      </Cells>\n")

        out.write('      <PointData Scalars="phase" Vectors="velocity">\n')
        out.write('        <DataArray type="Float64" Name="velocity" '
                  'NumberOfComponents="3" format="ascii">\n')
        _fmt_vec_block(out, vel3)
        out.write("        </DataArray>\n")

        def scalar(name, data, vtype="Float64", fmt="%.9g"):
            out.write(f'        <DataArray type="{vtype}" Name="{name}" format="ascii">\n')
            _fmt_block(out, data, fmt=fmt)
            out.write("        </DataArray>\n")

        scalar("pressure", _safe(np.asarray(state.pressure, np.float64).ravel()[idx]))
        scalar("concentration", _safe(np.asarray(state.C, np.float64).ravel()[idx]))
        scalar("phase", np.asarray(state.phase).ravel()[idx], "UInt8", "%d")
        scalar("node_type", nt[idx], "UInt8", "%d")
        if getattr(grid, "grid_level", None) is not None:
            scalar("grid_level", np.asarray(grid.grid_level).ravel()[idx], "Int32", "%d")
            scalar("dx_local", np.asarray(grid.dx_local).ravel()[idx])
        scalar("grain_id", np.asarray(state.grain_id).ravel()[idx], "Int32", "%d")
        scalar("D_map", _safe(np.asarray(state.D_map, np.float64).ravel()[idx]))
        scalar("is_grain_boundary", np.asarray(state.is_gb).ravel()[idx].astype(np.uint8), "UInt8", "%d")
        scalar("is_precipitate", np.asarray(state.is_precip).ravel()[idx].astype(np.uint8), "UInt8", "%d")

        out.write("      </PointData>\n    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n")
        with open(filename, "w") as f:
            f.write(out.getvalue())

    # ------------------------------------------------------------------
    def set_pvd_path(self, path: str) -> None:
        self._pvd_path = path

    def load_pvd(self, filename: str, t_max: float | None = None) -> int:
        """Reload collection entries from an existing PVD (resume support:
        without this, a resumed run rewrites the collection with only
        post-resume snapshots and orphans the earlier time series).
        Entries after ``t_max`` (outputs written past the checkpoint being
        resumed) are dropped. Returns the number of entries loaded."""
        import re

        if not os.path.exists(filename):
            return 0
        pvd_dir = filename[: filename.rfind("/") + 1] if "/" in filename else ""
        pat = re.compile(r'<DataSet timestep="([^"]+)" file="([^"]+)"/>')
        entries = []
        with open(filename) as f:
            for line in f:
                m = pat.search(line)
                if m:
                    t = float(m.group(1))
                    if t_max is None or t <= t_max + 1e-9:
                        entries.append((t, pvd_dir + m.group(2)))
        # a crash between the PVD rewrite and the (asynchronous) VTI file
        # write can leave a trailing entry without its file; drop those
        kept = [(t, f) for t, f in entries if os.path.exists(f)]
        if len(kept) != len(entries):
            print(f"WARNING: {len(entries) - len(kept)} PVD entr"
                  f"{'y' if len(entries) - len(kept) == 1 else 'ies'} in "
                  f"{filename} reference missing files; dropped",
                  file=sys.stderr)
        self._entries = kept
        return len(kept)

    def add_timestep(self, time: float, vti_file: str) -> None:
        self._entries.append((time, vti_file))
        if self._pvd_path:
            self.write_pvd(self._pvd_path)

    def write_pvd(self, filename: str) -> None:
        """Rewrite the full collection (crash-safe, vtk_writer.cpp:160-193)."""
        pvd_dir = filename[: filename.rfind("/") + 1] if "/" in filename else ""
        with open(filename, "w") as out:
            out.write('<?xml version="1.0"?>\n')
            out.write('<VTKFile type="Collection" version="1.0" byte_order="LittleEndian">\n')
            out.write("  <Collection>\n")
            for t, f in self._entries:
                rel = f[len(pvd_dir):] if pvd_dir and f.startswith(pvd_dir) else f
                out.write(f'    <DataSet timestep="{t:.6e}" file="{rel}"/>\n')
            out.write("  </Collection>\n")
            out.write("</VTKFile>\n")

"""Minimal Gadget snapshot reader (formats 1 and 2, single or multi-file).

The reference delegates Gadget reading to Pylians' ``readgadget``
(initial_conditions.py:338-399); that package is not available here, so
this is a small self-contained reader for the classic unformatted-Fortran
snapshot layout: a 256-byte header block followed by POS and VEL blocks of
float32 triplets, each framed by 4-byte record markers. Format 2 adds a
16-byte block-name frame before each block.

Only what the IC path needs is implemented: the header fields used for
unit/cosmology checks and the dark-matter (type 1) positions/velocities.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

_HEADER_FMT = "<6I6dddii6Iiiddddii6Ii"  # classic 256-byte header prefix


@dataclass
class GadgetHeader:
    npart: Tuple[int, ...]
    mass: Tuple[float, ...]
    time: float
    redshift: float
    npart_total: Tuple[int, ...]
    num_files: int
    boxsize: float
    omega_m: float
    omega_l: float
    hubble: float


def _read_record(f) -> bytes:
    raw = f.read(4)
    if len(raw) < 4:
        raise EOFError("unexpected end of gadget file")
    (n,) = struct.unpack("<I", raw)
    data = f.read(n)
    (n2,) = struct.unpack("<I", f.read(4))
    if n2 != n:
        raise ValueError(f"gadget record marker mismatch ({n} != {n2})")
    return data


def _detect_format2(f) -> bool:
    pos = f.tell()
    raw = f.read(4)
    f.seek(pos)
    if len(raw) < 4:
        return False
    (n,) = struct.unpack("<I", raw)
    return n == 8  # format-2 name frames are always 8 bytes long


def _read_block(f, fmt2: bool) -> Tuple[str, bytes]:
    if fmt2:
        name_rec = _read_record(f)
        name = name_rec[:4].decode("ascii", errors="replace").strip()
    else:
        name = ""
    return name, _read_record(f)


def read_header(filename: str) -> GadgetHeader:
    with open(filename, "rb") as f:
        fmt2 = _detect_format2(f)
        _, data = _read_block(f, fmt2)
        vals = struct.unpack(_HEADER_FMT, data[: struct.calcsize(_HEADER_FMT)])
        npart = vals[0:6]
        mass = vals[6:12]
        time, redshift = vals[12], vals[13]
        npart_total = vals[16:22]
        num_files = vals[23]
        boxsize, omega_m, omega_l, hubble = vals[24:28]
        return GadgetHeader(
            npart=npart, mass=mass, time=time, redshift=redshift,
            npart_total=npart_total, num_files=num_files, boxsize=boxsize,
            omega_m=omega_m, omega_l=omega_l, hubble=hubble,
        )


def _snapshot_files(filename: str) -> List[str]:
    if os.path.exists(filename):
        return [filename]
    files = []
    i = 0
    while os.path.exists(f"{filename}.{i}"):
        files.append(f"{filename}.{i}")
        i += 1
    if not files:
        raise FileNotFoundError(filename)
    return files


def read_particles(filename: str, ptype: int = 1):
    """Read (positions, velocities) float32 arrays for one particle type.

    Positions/velocities are returned in the file's units (kpc/h or Mpc/h
    and gadget velocity units); the caller handles conversion, as the
    reference does (initial_conditions.py:380-399).
    """
    files = _snapshot_files(filename)
    pos_parts, vel_parts = [], []
    for path in files:
        with open(path, "rb") as f:
            fmt2 = _detect_format2(f)
            _, header_data = _read_block(f, fmt2)
            vals = struct.unpack(
                _HEADER_FMT, header_data[: struct.calcsize(_HEADER_FMT)]
            )
            npart = vals[0:6]
            ntot = sum(npart)
            before = sum(npart[:ptype])
            count = npart[ptype]

            _, pos_data = _read_block(f, fmt2)
            pos = np.frombuffer(pos_data, dtype="<f4").reshape(ntot, 3)
            pos_parts.append(pos[before:before + count].copy())

            _, vel_data = _read_block(f, fmt2)
            vel = np.frombuffer(vel_data, dtype="<f4").reshape(ntot, 3)
            vel_parts.append(vel[before:before + count].copy())
    return np.concatenate(pos_parts), np.concatenate(vel_parts)


def write_snapshot(filename: str, position: np.ndarray, velocity: np.ndarray,
                   boxsize: float, redshift: float, omega_m: float,
                   omega_l: float, hubble: float) -> None:
    """Write a single-file format-1 snapshot (dark matter only).

    Mostly for round-tripping in tests; positions in the same units they
    are given.
    """
    n = position.shape[0]
    header = struct.pack(
        _HEADER_FMT,
        0, n, 0, 0, 0, 0,
        0.0, 1.0, 0.0, 0.0, 0.0, 0.0,
        1.0 / (1 + redshift), redshift, 0, 0,
        0, n, 0, 0, 0, 0,
        0, 1, boxsize, omega_m, omega_l, hubble, 0, 0,
        0, 0, 0, 0, 0, 0, 0,
    )
    header = header + b"\x00" * (256 - len(header))

    def rec(data: bytes) -> bytes:
        return struct.pack("<I", len(data)) + data + struct.pack("<I", len(data))

    with open(filename, "wb") as f:
        f.write(rec(header))
        f.write(rec(np.ascontiguousarray(position, "<f4").tobytes()))
        f.write(rec(np.ascontiguousarray(velocity, "<f4").tobytes()))

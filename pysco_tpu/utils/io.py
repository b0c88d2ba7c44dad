"""Snapshot and power-spectrum I/O, PySCo-compatible on-disk formats.

- HDF5 snapshots: datasets ``position``/``velocity`` + every parameter as a
  root attribute (reference iostream.py:229-265), so snapshots are
  interchange-compatible with the reference for restart.
- Parquet snapshots: columns x,y,z,vx,vy,vz plus a ``param_*.txt`` sidecar.
- P(k): 3-column ASCII with aexp/boxlen/npart header into
  ``base/power/pk_{extra}_{nsteps:05d}.dat`` (iostream.py:268-304).
"""

from __future__ import annotations

import logging
import os
from typing import Tuple

import numpy as np


def write_snapshot_particles(position, velocity, param) -> None:
    fmt = str(param["output_snapshot_format"]).casefold()
    i_snap = int(param["i_snap"])
    if fmt == "parquet":
        filename = (
            f"{param['base']}/output_{i_snap:05d}/particles_{param['extra']}.parquet"
        )
        write_snapshot_particles_parquet(filename, position, velocity)
        param_filename = (
            f"{param['base']}/output_{i_snap:05d}/"
            f"param_{param['extra']}_{i_snap:05d}.txt"
        )
        write_param_txt(param_filename, param)
    elif fmt == "hdf5":
        filename = f"{param['base']}/output_{i_snap:05d}/particles_{param['extra']}.h5"
        write_snapshot_particles_hdf5(filename, position, velocity, param)
    else:
        raise NotImplementedError(
            f"output_snapshot_format {fmt!r}, should be 'parquet' or 'hdf5'"
        )
    logging.warning("Snapshot written at %s aexp=%s", filename, param["aexp"])


def write_param_txt(filename: str, param) -> None:
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    with open(filename, "w") as f:
        for key, value in param.items():
            f.write(f"{key}={value}\n")


def write_snapshot_particles_parquet(filename, position, velocity) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(filename), exist_ok=True)
    position = np.asarray(position)
    velocity = np.asarray(velocity)
    table = pa.table(
        {
            "x": position[:, 0],
            "y": position[:, 1],
            "z": position[:, 2],
            "vx": velocity[:, 0],
            "vy": velocity[:, 1],
            "vz": velocity[:, 2],
        }
    )
    pq.write_table(table, filename)


def write_snapshot_particles_hdf5(filename, position, velocity, param) -> None:
    import h5py

    os.makedirs(os.path.dirname(filename), exist_ok=True)
    with h5py.File(filename, "w") as h5f:
        h5f.create_dataset("position", data=np.asarray(position))
        h5f.create_dataset("velocity", data=np.asarray(velocity))
        for key, item in param.items():
            try:
                h5f.attrs[key] = item
            except TypeError:
                h5f.attrs[key] = str(item)


def read_snapshot_particles_hdf5(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    import h5py

    logging.warning("Read HDF5 snapshot %s", filename)
    with h5py.File(filename, "r") as h5r:
        position = h5r["position"][:]
        velocity = h5r["velocity"][:]
    return position, velocity


def read_snapshot_particles_parquet(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    logging.warning("Read parquet snapshot %s", filename)
    t = pq.read_table(filename)
    position = np.ascontiguousarray(
        np.stack([t[c].to_numpy() for c in ("x", "y", "z")], axis=1)
    )
    velocity = np.ascontiguousarray(
        np.stack([t[c].to_numpy() for c in ("vx", "vy", "vz")], axis=1)
    )
    return position, velocity


def read_hdf5_snapshot_attrs(filename: str) -> dict:
    import h5py

    with h5py.File(filename, "r") as h5r:
        return {k: v for k, v in h5r.attrs.items()}


def write_power_spectrum_to_ascii_file(k, Pk, Nmodes, param) -> None:
    output_pk = (
        f"{param['base']}/power/pk_{param['extra']}_{int(param['nsteps']):05d}.dat"
    )
    os.makedirs(os.path.dirname(output_pk), exist_ok=True)
    logging.warning("Write P(k) in %s", output_pk)
    np.savetxt(
        output_pk,
        np.c_[np.asarray(k), np.asarray(Pk), np.asarray(Nmodes)],
        header=(
            f"aexp = {param['aexp']}\nboxlen = {param['boxlen']} Mpc/h \n"
            f"npart = {param['npart']} \nk [h/Mpc] P(k) [Mpc/h]^3 Nmodes"
        ),
    )

"""VTU point-cloud export (reference ``ppsci/visualize/vtu.py:29-150``).

The reference depends on meshio; unavailable here, so this writes the VTK XML
UnstructuredGrid format directly (ASCII appended-free variant) — readable by
ParaView/VisIt. Points are exported as VTK_VERTEX cells with named point-data
arrays, matching the reference's save_vtu_from_dict contract.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

__all__ = ["save_vtu_from_dict", "save_vtu_to_mesh"]


def _fmt_array(arr: np.ndarray) -> str:
    return "\n".join(" ".join(f"{v:.7g}" for v in row) for row in np.atleast_2d(arr))


def save_vtu_from_dict(
    filename: str,
    data_dict: Dict[str, np.ndarray],
    coord_keys: Sequence[str],
    value_keys: Sequence[str],
    num_timestamps: int = 1,
) -> None:
    """Write point data to .vtu; one file per timestamp slice when
    num_timestamps > 1 (reference vtu.py behavior)."""
    if len(coord_keys) == 0:
        raise ValueError("coord_keys must not be empty")
    if not filename.endswith(".vtu"):
        filename += ".vtu"
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)

    n_total = len(data_dict[coord_keys[0]])
    n_per = n_total // num_timestamps
    for ts in range(num_timestamps):
        sl = slice(ts * n_per, (ts + 1) * n_per)
        coords = []
        for key in coord_keys:
            if key == "t":
                continue
            coords.append(np.asarray(data_dict[key][sl]).reshape(n_per, -1))
        xyz = np.concatenate(coords, axis=1)
        if xyz.shape[1] < 3:
            xyz = np.concatenate([xyz, np.zeros((n_per, 3 - xyz.shape[1]))], axis=1)

        point_data_xml = []
        for key in value_keys:
            arr = np.asarray(data_dict[key][sl]).reshape(n_per, -1)
            ncomp = arr.shape[1]
            point_data_xml.append(
                f'<DataArray type="Float32" Name="{key}" NumberOfComponents="{ncomp}" format="ascii">\n'
                + _fmt_array(arr)
                + "\n</DataArray>"
            )

        connectivity = " ".join(str(i) for i in range(n_per))
        offsets = " ".join(str(i + 1) for i in range(n_per))
        types = " ".join("1" for _ in range(n_per))  # VTK_VERTEX

        out = filename if num_timestamps == 1 else filename.replace(".vtu", f"_t-{ts}.vtu")
        with open(out, "w") as f:
            f.write(
                f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
  <UnstructuredGrid>
    <Piece NumberOfPoints="{n_per}" NumberOfCells="{n_per}">
      <Points>
        <DataArray type="Float32" NumberOfComponents="3" format="ascii">
{_fmt_array(xyz)}
        </DataArray>
      </Points>
      <Cells>
        <DataArray type="Int32" Name="connectivity" format="ascii">{connectivity}</DataArray>
        <DataArray type="Int32" Name="offsets" format="ascii">{offsets}</DataArray>
        <DataArray type="UInt8" Name="types" format="ascii">{types}</DataArray>
      </Cells>
      <PointData>
        {os.linesep.join(point_data_xml)}
      </PointData>
    </Piece>
  </UnstructuredGrid>
</VTKFile>
"""
            )


def save_vtu_to_mesh(filename: str, data_dict, coord_keys, value_keys):
    """Alias of point export (mesh-cell export lands with the Mesh geometry)."""
    return save_vtu_from_dict(filename, data_dict, coord_keys, value_keys)

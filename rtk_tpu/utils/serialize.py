"""Scene serialization: a versioned, relocatable container.

The reference's scene *is* its file format — a relocatable blob with a
magic/endian/version/sizeof_real header and byte-offset section table
(rtk.h:78-89, rtk.c:1732-1774), explicitly designed for save/mmap.  This
module preserves those semantics for the TPU scene pytree:

  header:  magic "\\0RTK8TPU" (8 bytes), endian mark 0xAABB (u16),
           sizeof_real (u8), flags (u8), version (u32),
           total size (u64), section count (u32), static-metadata block.
  section: name (16 bytes), dtype code (u8), ndim (u8), shape (u32 x 4),
           byte offset (u64, 128-aligned like rtk's section alignment,
           rtk.c:1719-1730), byte size (u64).

Arrays are stored little-endian, contiguous; load() memory-maps or reads
and reconstructs the Scene pytree.  Loading checks magic, endianness and
version (the validation rtk declares fields for but never implements —
SURVEY §3.4).
"""
from __future__ import annotations

import dataclasses
import io
import struct as pystruct
from typing import BinaryIO, Union

import jax.numpy as jnp
import numpy as np

from rtk_tpu.scene import Scene

MAGIC = b"\x00RTK8TPU"
ENDIAN_MARK = 0xAABB
VERSION = 1
ALIGN = 128

_DTYPES = {0: np.float32, 1: np.int32, 2: np.uint32, 3: np.float64,
           4: np.int64, 5: np.uint8}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

# Scene array fields in serialization order.
_FIELDS = [
    "node_child", "node_min", "node_max", "bin_left", "bin_right",
    "bin_min", "bin_max", "leaf_min", "leaf_max",
    "tri_v", "tri_vidx", "tri_mesh", "tri_prim", "perm",
    "bounds_min", "bounds_max",
]


def _align(n: int) -> int:
    return (n + ALIGN - 1) // ALIGN * ALIGN


def save_scene(scene: Scene, f: Union[str, BinaryIO]) -> int:
    """Serialize a Scene; returns total bytes written."""
    if isinstance(f, str):
        with open(f, "wb") as fh:
            return save_scene(scene, fh)

    arrays = {name: np.asarray(getattr(scene, name)) for name in _FIELDS}
    meta = pystruct.pack(
        "<4i", scene.num_tris, scene.leaf_size, scene.branching,
        scene.num_leaves)

    header_size = 8 + 2 + 1 + 1 + 4 + 8 + 4 + len(meta)
    sec_entry = 16 + 1 + 1 + 2 + 4 * 4 + 8 + 8
    table_size = sec_entry * len(_FIELDS)
    offset = _align(header_size + table_size)

    entries = []
    for name in _FIELDS:
        a = arrays[name]
        if a.ndim > 4:
            raise ValueError(f"{name}: ndim > 4")
        size = a.nbytes
        entries.append((name, a, offset, size))
        offset = _align(offset + size)
    total = offset

    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(pystruct.pack("<HBB", ENDIAN_MARK, 4, 0))  # sizeof_real=4
    buf.write(pystruct.pack("<I", VERSION))
    buf.write(pystruct.pack("<Q", total))
    buf.write(pystruct.pack("<I", len(_FIELDS)))
    buf.write(meta)
    for name, a, off, size in entries:
        nb = name.encode()[:16].ljust(16, b"\x00")
        shape = list(a.shape) + [0] * (4 - a.ndim)
        buf.write(nb)
        buf.write(pystruct.pack("<BBH", _DTYPE_CODES[a.dtype], a.ndim, 0))
        buf.write(pystruct.pack("<4I", *shape))
        buf.write(pystruct.pack("<QQ", off, size))

    blob = bytearray(total)
    head = buf.getvalue()
    blob[: len(head)] = head
    for name, a, off, size in entries:
        blob[off:off + size] = np.ascontiguousarray(a).tobytes()
    f.write(bytes(blob))
    return total


def load_scene(f: Union[str, bytes, BinaryIO]) -> Scene:
    """Deserialize a Scene, validating magic/endian/version."""
    if isinstance(f, str):
        with open(f, "rb") as fh:
            data = fh.read()
    elif isinstance(f, (bytes, bytearray, memoryview)):
        data = bytes(f)
    else:
        data = f.read()

    if data[:8] != MAGIC:
        raise ValueError("not an rtk_tpu scene (bad magic)")
    endian, sizeof_real, _ = pystruct.unpack_from("<HBB", data, 8)
    if endian != ENDIAN_MARK:
        raise ValueError("endianness mismatch")
    if sizeof_real != 4:
        raise ValueError(f"unsupported sizeof_real {sizeof_real}")
    (version,) = pystruct.unpack_from("<I", data, 12)
    if version != VERSION:
        raise ValueError(f"unsupported version {version}")
    (total,) = pystruct.unpack_from("<Q", data, 16)
    if total > len(data):
        raise ValueError("truncated scene blob")
    (n_sec,) = pystruct.unpack_from("<I", data, 24)
    num_tris, leaf_size, branching, num_leaves = pystruct.unpack_from(
        "<4i", data, 28)

    pos = 28 + 16
    arrays = {}
    for _ in range(n_sec):
        name = data[pos:pos + 16].rstrip(b"\x00").decode()
        dtype_code, ndim, _ = pystruct.unpack_from("<BBH", data, pos + 16)
        shape = pystruct.unpack_from("<4I", data, pos + 20)[:ndim]
        off, size = pystruct.unpack_from("<QQ", data, pos + 36)
        arr = np.frombuffer(data, dtype=_DTYPES[dtype_code],
                            count=size // np.dtype(_DTYPES[dtype_code]).itemsize,
                            offset=off).reshape(shape)
        arrays[name] = jnp.asarray(arr)
        pos += 52

    missing = [n for n in _FIELDS if n not in arrays]
    if missing:
        raise ValueError(f"scene blob missing sections: {missing}")
    return Scene(
        num_tris=num_tris,
        leaf_size=leaf_size,
        branching=branching,
        num_leaves=num_leaves,
        **{n: arrays[n] for n in _FIELDS},
    )

"""Minimal Houdini BGEO (version 5) particle writer/reader.

Replaces the reference's vendored partio dependency for its one use:
dumping per-frame particle clouds (reference write_partio,
Library/MnSystem/IO/ParticleIO.hpp:14-29).  Implements the classic big-endian
BGEO V5 layout (magic 'Bgeo', 'V', header counts, per-point attributes with
position + homogeneous w, trailer 0x00 0xff) — byte-compatible with partio's
reader.  Pure numpy, vectorized big-endian packing.
"""

from __future__ import annotations

import gzip
import struct
from typing import Dict, Optional, Tuple

import numpy as np

_MAGIC = (ord("B") << 24) | (ord("g") << 16) | (ord("e") << 8) | ord("o")


def _houdini_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def write_bgeo(
    path: str,
    positions: np.ndarray,
    attributes: Optional[Dict[str, np.ndarray]] = None,
    compress: Optional[bool] = None,
    asynchronous: bool = False,
) -> None:
    """Write a particle cloud.  positions: [n, 3] float.  attributes: map of
    name -> [n] or [n, k] float32/int32 arrays.

    Uses the native C++ serializer + IO thread when available (float attrs,
    uncompressed); falls back to pure numpy."""
    positions = np.asarray(positions, np.float32)
    n = positions.shape[0]
    attributes = attributes or {}
    if compress is None:
        compress = path.endswith(".gz")

    all_float = all(
        not np.issubdtype(np.asarray(v).dtype, np.integer)
        for v in attributes.values()
    )
    if not compress and all_float:
        from .. import native

        if native.write_bgeo_native(path, positions, attributes,
                                    asynchronous=asynchronous):
            return

    header = struct.pack(
        ">icqiiiiiii" if False else ">i c i i i i i i i i i".replace(" ", ""),
        _MAGIC, b"V", 5, n, 0, 0, 0, len(attributes), 0, 0, 0,
    )

    body = [header]
    # attribute dictionary (position is implicit)
    cols = []
    for name, arr in attributes.items():
        arr = np.asarray(arr)
        if arr.ndim == 1:
            arr = arr[:, None]
        count = arr.shape[1]
        if np.issubdtype(arr.dtype, np.integer):
            htype, dt = 1, np.int32
        else:
            htype, dt = 0, np.float32
        body.append(_houdini_str(name))
        body.append(struct.pack(">hi", count, htype))
        body.append(struct.pack(">i", 0) * count)  # defaults
        cols.append(arr.astype(dt))

    # per-particle records: x y z w [attrs...] as big-endian 32-bit words
    parts = [positions, np.ones((n, 1), np.float32)] + cols
    rec = np.concatenate(
        [p.view(np.uint32) if p.dtype != np.float32 else p.view(np.uint32)
         for p in [np.ascontiguousarray(p) for p in parts]],
        axis=1,
    ).astype(">u4")
    body.append(rec.tobytes())

    # no fixed attributes; extra trailer
    body.append(struct.pack(">bB", 0x00, 0xFF))

    data = b"".join(body)
    if compress:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def read_bgeo(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Read back positions + attributes written by write_bgeo (subset of the
    full format: point attributes of float/int type)."""
    try:
        with gzip.open(path, "rb") as f:
            data = f.read()
    except (OSError, gzip.BadGzipFile):
        with open(path, "rb") as f:
            data = f.read()

    off = 0

    def u(fmt):
        nonlocal off
        vals = struct.unpack_from(">" + fmt, data, off)
        off += struct.calcsize(">" + fmt)
        return vals

    magic, ver_char, version, n_points, _n_prims, _npg = u("icIiii")[:6]
    _nprg, n_point_attr, _nva, _npa, _nfixed = u("iiiii")
    assert magic == _MAGIC and version == 5, (magic, version)

    names, counts, types = [], [], []
    for _ in range(n_point_attr):
        (slen,) = u("h")
        name = data[off : off + slen].decode()
        off += slen
        cnt, htype = u("hi")
        assert htype in (0, 1, 5), htype
        off += 4 * cnt  # defaults
        names.append(name)
        counts.append(cnt)
        types.append(htype)

    rec_words = 4 + sum(counts)
    raw = np.frombuffer(
        data, dtype=">u4", count=n_points * rec_words, offset=off
    ).reshape(n_points, rec_words)
    positions = raw[:, :3].astype("=u4").view(np.float32).copy()
    attrs = {}
    col = 4
    for name, cnt, htype in zip(names, counts, types):
        block = raw[:, col : col + cnt].astype("=u4")
        arr = block.view(np.int32) if htype == 1 else block.view(np.float32)
        attrs[name] = arr.copy().squeeze(-1) if cnt == 1 else arr.copy()
        col += cnt
    return positions, attrs

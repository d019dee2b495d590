"""Pure-python COCO run-length-encoded (RLE) mask codec.

Parity target: the reference accepts COCO RLE segmentation dicts through
pycocotools (wetectron/structures/segmentation_mask.py:40-75 decodes
them in BinaryMaskList.__init__ via mask_utils.decode). pycocotools is
not available in this environment, so this module reimplements the two
RLE wire formats from the COCO spec:

- uncompressed: {"counts": [int, ...], "size": [h, w]} — alternating
  run lengths over the mask flattened in COLUMN-major (Fortran) order,
  starting with the run of zeros (possibly length 0);
- compressed:   {"counts": str|bytes, "size": [h, w]} — pycocotools'
  LEB128-like base-32 varint string: each count is delta-coded against
  the count two positions back (from the third count on), then emitted
  as 5-bit chunks, low chunk first, each chunk OR'd with a continuation
  bit (0x20) while more chunks follow, and offset by 48 into printable
  ASCII. Sign extension uses bit 0x10 of the final chunk.

Both directions are implemented (encode is used by tests and by
round-tripping golden cases); numpy vectorises the runs<->mask step so
full-image masks decode in microseconds.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np


def _counts_from_string(s: Union[str, bytes]) -> List[int]:
    """pycocotools rleFrString: base-32 varint + order-2 delta coding."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _counts_to_string(counts: Sequence[int]) -> str:
    """pycocotools rleToString (inverse of _counts_from_string)."""
    out = bytearray()
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            # arithmetic shift: sign bit of the emitted chunk decides
            # whether the remaining bits are already pure sign fill
            more = (x != -1) if (chunk & 0x10) else (x != 0)
            if more:
                chunk |= 0x20
            out.append(chunk + 48)
    return out.decode("ascii")


def rle_decode(rle: Dict) -> np.ndarray:
    """COCO RLE dict (compressed or uncompressed) -> uint8 [H, W] mask."""
    h, w = int(rle["size"][0]), int(rle["size"][1])
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _counts_from_string(counts)
    counts = np.asarray(counts, np.int64)
    if counts.sum() != h * w:
        raise ValueError(
            f"RLE counts sum {int(counts.sum())} != h*w {h * w}")
    # runs alternate 0,1,0,1,... in column-major order
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((w, h)).T.copy()  # Fortran order -> [H, W]


def rle_encode(mask: np.ndarray) -> Dict:
    """uint8/bool [H, W] mask -> compressed COCO RLE dict."""
    m = (np.asarray(mask) != 0).astype(np.uint8)
    h, w = m.shape
    flat = m.T.reshape(-1)  # column-major
    # run boundaries
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate(([0], change, [flat.size]))
    runs = np.diff(starts).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    if not flat.size:
        runs = []
    return {"size": [h, w], "counts": _counts_to_string(runs)}


def is_rle(seg) -> bool:
    """True for a COCO RLE segmentation dict (vs a polygon list)."""
    return isinstance(seg, dict) and "counts" in seg and "size" in seg


def rasterize_segmentation(seg, height: int, width: int) -> np.ndarray:
    """COCO 'segmentation' field (polygon list OR RLE dict) -> uint8
    [H, W]. The single ingestion point matching the reference's
    SegmentationMask mode dispatch (segmentation_mask.py:497-516)."""
    if is_rle(seg):
        m = rle_decode(seg)
        if m.shape != (height, width):
            raise ValueError(
                f"RLE size {m.shape} != image size {(height, width)}")
        return m
    from .masks import rasterize_polygons
    return rasterize_polygons([np.asarray(p) for p in (seg or [])],
                              height, width)

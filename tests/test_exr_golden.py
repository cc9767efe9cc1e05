"""Byte-level EXR goldens + header fuzzing (VERDICT r3 missing #4).

The codec's round-trip tests are self-consistent by construction: a
systematic encode bug mirrored in decode would pass them and only fail on
real Blender output (no independent EXR implementation exists in this
environment — verified r3: cv2 without OpenEXR, imageio fails, no OpenEXR
module). These tests break the circle the only way available: golden EXR
byte streams are HAND-CONSTRUCTED here from the OpenEXR spec (a second,
independent transcription of the format), then decoded by the codec —
covering the paths Blender can emit that the fixtures don't exercise:
DECREASING_Y line order and UINT pixels.

The fuzz corpus mutates valid files and asserts the decoder fails
CONTROLLED (ValueError/NotImplementedError/struct.error) — never an
IndexError/OverflowError crash and never a silent wrong-shaped success.
"""

import struct

import numpy as np
import pytest

from deepdenoiser_tpu.data import exr_codec

MAGIC = 20000630


def _attr(name: str, atype: str, value: bytes) -> bytes:
    return (name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(value)) + value)


def _chlist(entries) -> bytes:
    # entries: [(name, pixel_type int)]
    out = b""
    for name, pt in entries:
        out += name.encode() + b"\x00"
        out += struct.pack("<iB3xii", pt, 0, 1, 1)
    return out + b"\x00"


def _header(channels, data_window, line_order: int, compression: int = 0) -> bytes:
    x0, y0, x1, y1 = data_window
    h = struct.pack("<ii", MAGIC, 2)
    h += _attr("channels", "chlist", _chlist(channels))
    h += _attr("compression", "compression", bytes([compression]))
    h += _attr("dataWindow", "box2i", struct.pack("<4i", x0, y0, x1, y1))
    h += _attr("displayWindow", "box2i", struct.pack("<4i", x0, y0, x1, y1))
    h += _attr("lineOrder", "lineOrder", bytes([line_order]))
    h += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    h += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    h += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    h += b"\x00"  # end of header
    return h


def test_decreasing_line_order_golden():
    """2x3 FLOAT image, lineOrder=DECREASING_Y (1): scanline blocks stored
    bottom row first, each carrying its own y. Blender/OpenEXR can emit
    this; the decoder must place rows by the y field, not file order."""
    w, h = 3, 2
    rows = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    header = _header([("R", 2)], (0, 0, w - 1, h - 1), line_order=1)
    row_bytes = 4 * w
    # two blocks, bottom (y=1) first in the file, as DECREASING_Y stores
    blocks = []
    for y in (1, 0):
        blocks.append(struct.pack("<ii", y, row_bytes) + rows[y].tobytes())
    # offset table in file order (the spec orders the table by the order
    # the lines appear in the file for DECREASING_Y)
    base = len(header) + 8 * 2
    offs, pos = [], base
    for b in blocks:
        offs.append(pos)
        pos += len(b)
    data = header + struct.pack("<2Q", *offs) + b"".join(blocks)

    img = exr_codec.decode(data)
    assert img.attributes["lineOrder"] == 1
    np.testing.assert_array_equal(img.channels["R"], rows)


def test_uint_pixels_golden():
    """UINT (pixel type 0) channel with 32-bit ids — exact integers."""
    w, h = 4, 1
    vals = np.asarray([[0, 1, 0xDEADBEEF, 0xFFFFFFFF]], np.uint32)
    header = _header([("id", 0)], (0, 0, w - 1, h - 1), line_order=0)
    block = struct.pack("<ii", 0, 4 * w) + vals.tobytes()
    off = len(header) + 8
    data = header + struct.pack("<Q", off) + block

    img = exr_codec.decode(data)
    assert img.channels["id"].dtype == np.uint32
    np.testing.assert_array_equal(img.channels["id"], vals)


def test_half_bit_pattern_golden():
    """HALF (pixel type 1) with hand-picked bit patterns: 0x3C00 = 1.0,
    0xC000 = -2.0, 0x7C00 = +inf, 0x0001 = smallest subnormal."""
    w, h = 4, 1
    bits = np.asarray([[0x3C00, 0xC000, 0x7C00, 0x0001]], np.uint16)
    header = _header([("G", 1)], (0, 0, w - 1, h - 1), line_order=0)
    block = struct.pack("<ii", 0, 2 * w) + bits.tobytes()
    off = len(header) + 8
    data = header + struct.pack("<Q", off) + block

    img = exr_codec.decode(data)
    got = img.channels["G"]
    assert got.dtype == np.float16
    assert float(got[0, 0]) == 1.0
    assert float(got[0, 1]) == -2.0
    assert np.isinf(got[0, 2]) and got[0, 2] > 0
    assert float(got[0, 3]) == 2.0 ** -24


def test_nonzero_data_window_origin():
    """dataWindow min != (0,0): block y values are absolute; the decoder
    must subtract y_min."""
    w, h = 2, 2
    rows = np.asarray([[7.0, 8.0], [9.0, 10.0]], np.float32)
    header = _header([("R", 2)], (5, 10, 5 + w - 1, 10 + h - 1), line_order=0)
    blocks = [struct.pack("<ii", 10 + y, 4 * w) + rows[y].tobytes() for y in range(h)]
    base = len(header) + 8 * 2
    offs, pos = [], base
    for b in blocks:
        offs.append(pos)
        pos += len(b)
    data = header + struct.pack("<2Q", *offs) + b"".join(blocks)

    img = exr_codec.decode(data)
    np.testing.assert_array_equal(img.channels["R"], rows)


def _valid_sample_bytes() -> bytes:
    rng = np.random.default_rng(3)
    return exr_codec.encode(
        {"R": rng.random((8, 8), np.float32).astype(np.float32)},
        pixel_type="float", compression="zip",
    )


ALLOWED = (ValueError, NotImplementedError, struct.error, KeyError,
           EOFError, OSError)


def test_fuzz_header_byte_flips():
    """Single-byte corruption anywhere in the header region must either
    decode (benign field) or raise a controlled error — never crash with
    IndexError/Overflow, never hang."""
    base = bytearray(_valid_sample_bytes())
    # header region = everything before the first offset-table byte; 8x8
    # zip file is small, fuzz the first 120 bytes exhaustively
    span = min(120, len(base) - 1)
    import zlib

    crashes = []
    for pos in range(span):
        for delta in (0x01, 0x80, 0xFF):
            mutated = bytearray(base)
            mutated[pos] = mutated[pos] ^ delta
            try:
                img = exr_codec.decode(bytes(mutated))
                # a successful decode must still be structurally sane
                for arr in img.channels.values():
                    assert arr.ndim == 2
            except ALLOWED:
                pass
            except (IndexError, OverflowError, MemoryError,
                    zlib.error) as e:
                crashes.append((pos, delta, type(e).__name__))
    assert not crashes, f"uncontrolled decoder crashes: {crashes[:10]}"


def test_fuzz_truncations():
    base = _valid_sample_bytes()
    for cut in (4, 9, 40, len(base) // 2, len(base) - 3):
        try:
            exr_codec.decode(base[:cut])
        except ALLOWED:
            pass
        # silent success on truncation is acceptable only if all pixel
        # data survived the cut (it did not, so any return is a bug)
        else:
            pytest.fail(f"decode succeeded on a file truncated at {cut}")

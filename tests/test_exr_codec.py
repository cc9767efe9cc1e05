"""Round-trip + format-conformance tests for the pure-numpy EXR codec."""

import struct

import numpy as np
import pytest

from deepdenoiser_tpu.data import exr, exr_codec


@pytest.mark.parametrize("compression", ["none", "zip", "zips"])
@pytest.mark.parametrize("pixel_type", ["float", "half"])
def test_roundtrip(tmp_path, compression, pixel_type):
    rng = np.random.default_rng(0)
    h, w = 37, 53  # awkward sizes: exercise partial final ZIP block
    chans = {
        "R": rng.standard_normal((h, w)).astype(np.float32) * 10,
        "G": rng.standard_normal((h, w)).astype(np.float32),
        "B": np.zeros((h, w), np.float32),
    }
    p = tmp_path / "t.exr"
    exr_codec.write(p, chans, pixel_type=pixel_type, compression=compression)
    img = exr_codec.read(p)
    assert set(img.channels) == set(chans)
    for k in chans:
        want = chans[k].astype(np.float16).astype(np.float32) if pixel_type == "half" else chans[k]
        np.testing.assert_array_equal(img.channels[k].astype(np.float32), want)


def test_roundtrip_constant_4k_half():
    """Flat/black passes (empty AOVs, masks, constant alpha) ZIP-compress
    far beyond 64:1 — a constant 3840x2160 HALF channel is a ~37 KB file.
    The decoder's allocation guard must be an absolute cap, not a
    compressed-size ratio, or the codec rejects its own output and real
    Cycles renders with flat layers become unreadable (ADVICE r4 #1)."""
    chan = np.full((2160, 3840), 0.25, np.float32)
    data = exr_codec.encode({"A": chan}, pixel_type="half", compression="zip")
    assert len(data) < 1 << 20  # the premise: extreme compression ratio
    img = exr_codec.decode(data)
    np.testing.assert_array_equal(img.channels["A"].astype(np.float32), chan)


def test_reject_gigantic_data_window():
    """The absolute cap still rejects fuzzed windows that would allocate
    silly arrays (>4 GiB decoded)."""
    chan = np.zeros((8, 8), np.float32)
    data = bytearray(exr_codec.encode({"A": chan}, compression="none"))
    # patch dataWindow x_max to ~2^30 (header layout: find the box2i bytes)
    box = struct.pack("<4i", 0, 0, 7, 7)
    i = data.index(box)
    data[i : i + 16] = struct.pack("<4i", 0, 0, (1 << 30) - 1, 7)
    with pytest.raises(ValueError, match="cap 4 GiB"):
        exr_codec.decode(bytes(data))


def test_header_fields(tmp_path):
    p = tmp_path / "t.exr"
    exr_codec.write(p, {"Y": np.ones((20, 30), np.float32)})
    raw = p.read_bytes()
    assert struct.unpack_from("<i", raw, 0)[0] == exr_codec.MAGIC
    assert struct.unpack_from("<i", raw, 4)[0] == 2
    img = exr_codec.read(p)
    assert img.attributes["dataWindow"] == (0, 0, 29, 19)
    assert img.height == 20 and img.width == 30


def test_zip_pre_post_inverse():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=1001, dtype=np.uint8).tobytes()
    enc = exr_codec._zip_split_and_predict(data)
    dec = exr_codec._zip_unpredict_and_merge(enc)
    assert dec == data


def test_zip_incompressible_stored_raw(tmp_path):
    # pure noise: deflate won't shrink some blocks; reader must accept raw
    rng = np.random.default_rng(2)
    chans = {"Y": rng.standard_normal((64, 64)).astype(np.float32)}
    p = tmp_path / "n.exr"
    exr_codec.write(p, chans, compression="zip")
    img = exr_codec.read(p)
    np.testing.assert_array_equal(img.channels["Y"], chans["Y"])


def test_reject_bad_magic(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr file")
    with pytest.raises(ValueError):
        exr_codec.read(p)


def test_multilayer_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    passes_dict = {
        "diffuse_direct": rng.random((12, 15, 3)).astype(np.float32),
        "depth": rng.random((12, 15, 1)).astype(np.float32) * 50,
        "alpha": rng.random((12, 15, 1)).astype(np.float32),
    }
    p = tmp_path / "ml.exr"
    exr.save_multilayer_exr(p, passes_dict)
    loaded = exr.load_multilayer_exr(p)
    assert set(loaded) == set(passes_dict)
    for k in passes_dict:
        np.testing.assert_array_equal(loaded[k], passes_dict[k])


def test_multilayer_cycles_layer_names(tmp_path):
    rng = np.random.default_rng(4)
    img = {
        "RenderLayer.DiffDir.R": rng.random((8, 9)).astype(np.float32),
        "RenderLayer.DiffDir.G": rng.random((8, 9)).astype(np.float32),
        "RenderLayer.DiffDir.B": rng.random((8, 9)).astype(np.float32),
        "RenderLayer.Depth.Z": rng.random((8, 9)).astype(np.float32),
    }
    p = tmp_path / "cy.exr"
    exr_codec.write(p, img)
    loaded = exr.load_multilayer_exr(p)
    assert set(loaded) == {"diffuse_direct", "depth"}
    np.testing.assert_array_equal(loaded["diffuse_direct"][..., 0], img["RenderLayer.DiffDir.R"])


def test_frame_dir_multilayer_fallback(tmp_path):
    """A variant dir holding one multilayer EXR (Blender's output shape)
    loads through load_frame_dir transparently."""
    from deepdenoiser_tpu.data import synthetic

    clean = synthetic.generate_clean_passes(16, 16, seed=9)
    exr.save_multilayer_exr(tmp_path / "frame.exr", clean)
    loaded = exr.load_frame_dir(tmp_path)
    assert set(loaded) == set(clean)
    np.testing.assert_array_equal(loaded["combined"], clean["combined"])


def test_native_parity():
    """Native C split/predict == numpy reference (when the lib is built)."""
    from deepdenoiser_tpu.data import _native

    if not _native.available():
        pytest.skip("native/libexr_pack.so not built")
    rng = np.random.default_rng(7)
    for n in (1, 2, 7, 1000, 4097):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        enc_np = exr_codec._zip_split_and_predict_np(data)
        enc_c = _native.split_and_predict(data)
        assert enc_c == enc_np, n
        dec_np = exr_codec._zip_unpredict_and_merge_np(enc_np)
        dec_c = _native.unpredict_and_merge(enc_np)
        assert dec_c == dec_np == data, n


def test_rle_roundtrip(tmp_path):
    """RLE compression (the third OpenEXR codec Blender emits) round-trips,
    including constant regions (long runs) and noise (literal runs)."""
    rng = np.random.default_rng(11)
    img = np.zeros((24, 40), np.float32)
    img[4:12, 8:30] = 1.5  # constant block -> runs
    img[16:] = rng.standard_normal((8, 40)).astype(np.float32)  # literals
    p = tmp_path / "r.exr"
    exr_codec.write(p, {"Y": img}, compression="rle")
    out = exr_codec.read(p)
    np.testing.assert_array_equal(out.channels["Y"], img)


def test_rle_compress_decompress_unit():
    rng = np.random.default_rng(12)
    for data in (b"\x00" * 500, bytes(rng.integers(0, 4, 999, dtype=np.uint8)),
                 b"a", b"abc" * 200):
        enc = exr_codec._rle_compress(data)
        dec = exr_codec._rle_decompress(enc, len(data))
        assert dec == data

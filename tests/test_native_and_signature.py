"""Native JPEG helper + signature generator tests."""

import numpy as np
import pytest
from PIL import Image

from leaffliction_tpu.data.loader import decode_resize_pil
from leaffliction_tpu.utils.signature import SignatureGenerator

native = pytest.importorskip("leaffliction_tpu.data.native")


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    rng = np.random.default_rng(3)
    # smooth-ish image: decode comparisons meaningful
    base = np.linspace(0, 255, 256, dtype=np.float32)
    img = np.stack([np.tile(base, (256, 1))] * 3, -1)
    img += rng.normal(0, 10, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    path = tmp_path_factory.mktemp("jpeg") / "test.jpg"
    Image.fromarray(img).save(path, quality=95)
    return path


@pytest.mark.skipif(not native.native_available(),
                    reason="native decoder not built")
def test_native_full_decode_matches_pil(jpeg_file):
    ours = native.decode_full(str(jpeg_file))
    ref = np.asarray(Image.open(jpeg_file).convert("RGB"))
    assert np.array_equal(ours, ref)


@pytest.mark.skipif(not native.native_available(),
                    reason="native decoder not built")
def test_native_decode_resize_close_to_pil(jpeg_file):
    ours = native.decode_resize(str(jpeg_file), 128).astype(np.float32)
    ref = decode_resize_pil(str(jpeg_file), 128).astype(np.float32)
    # bilinear vs LANCZOS: close on smooth content
    assert np.abs(ours - ref).mean() < 8.0


@pytest.mark.skipif(not native.native_available(),
                    reason="native decoder not built")
def test_native_encode_roundtrip(jpeg_file, tmp_path):
    img = native.decode_full(str(jpeg_file))
    out = tmp_path / "out.jpg"
    native.encode(str(out), img, 95)
    redecoded = np.asarray(Image.open(out).convert("RGB")).astype(np.float32)
    assert np.abs(redecoded - img.astype(np.float32)).mean() < 8.0


@pytest.mark.skipif(not native.native_available(),
                    reason="native decoder not built")
def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    with pytest.raises(ValueError):
        native.decode_full(str(bad))


def test_signature_generator(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    artifacts = tmp_path / "artifacts"
    (artifacts / "models").mkdir(parents=True)
    (artifacts / "models" / "meta.json").write_text("{}")
    digest = SignatureGenerator().generate()
    assert len(digest) == 40
    assert (tmp_path / "signature.txt").read_text().strip() == digest
    assert (tmp_path / "artifacts.zip").exists()
    # deterministic for same content
    assert SignatureGenerator().generate() == digest

"""Codec + fixture tests: lossless round-trip, lossy PSNR ≥ 40 dB invariant,
phash stability, deterministic generation."""

import numpy as np
import pytest

from sylph_spark import codecs, fixtures


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(48, 56, 3), dtype=np.uint8)


class TestCodecs:
    @pytest.mark.parametrize("fmt", ["ppm", "bmp", "qpng"])
    def test_lossless_roundtrip(self, rgb, fmt):
        data = codecs.encode_image(rgb, fmt)
        out = codecs.decode_image(data, fmt)
        assert out.shape == rgb.shape
        assert (out == rgb).all()

    def test_qjpg_psnr_over_40(self, rgb):
        data = codecs.encode_image(rgb, "qjpg")
        out = codecs.decode_image(data, "qjpg")
        assert codecs.psnr(rgb, out) >= 40.0

    def test_qjpg_idempotent_reencode(self, rgb):
        once = codecs.decode_image(codecs.encode_image(rgb, "qjpg"), "qjpg")
        twice = codecs.decode_image(codecs.encode_image(once, "qjpg"), "qjpg")
        # re-encoding an already-quantized image changes little
        assert codecs.psnr(once, twice) >= 40.0

    def test_psnr_identity_inf(self, rgb):
        assert codecs.psnr(rgb, rgb) == float("inf")

    def test_phash_brightness_invariant(self):
        rng = np.random.default_rng(1)
        img = fixtures._make_image(rng)
        g1 = codecs.to_gray(img)
        g2 = codecs.to_gray(
            np.clip(img.astype(np.float64) * 1.03, 0, 255).astype(np.uint8)
        )
        h1, h2 = codecs.average_phash(g1), codecs.average_phash(g2)
        ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
        assert ham <= 6

    def test_phash_distinct_images_far(self):
        rng = np.random.default_rng(2)
        a = codecs.average_phash(codecs.to_gray(fixtures._make_image(rng)))
        b = codecs.average_phash(codecs.to_gray(fixtures._make_image(rng)))
        ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham >= 10


class TestFixtures:
    @pytest.fixture(scope="class")
    def corpus(self):
        return fixtures.generate_corpus(n_base=100, seed=42)

    def test_deterministic(self, corpus):
        images2, truth2 = fixtures.generate_corpus(n_base=100, seed=42)
        images, truth = corpus
        assert images.equals(images2)
        assert truth.equals(truth2)

    def test_schema_and_counts(self, corpus):
        images, truth = corpus
        assert list(images.columns) == [
            "image_id",
            "bytes",
            "w",
            "h",
            "fmt",
            "caption",
            "phash",
        ]
        assert len(images) == 100 + 10 + 15 + 15 + 10 + 10
        assert set(truth["kind"]) == {"exact", "reencode", "near_image", "near_caption"}
        assert images["image_id"].is_unique

    def test_all_rows_decodable(self, corpus):
        images, _ = corpus
        for r in images.itertuples():
            img = codecs.decode_image(r.bytes, r.fmt)
            assert img.shape == (r.h, r.w, 3)

    def test_exact_dups_byte_identical(self, corpus):
        images, truth = corpus
        by_id = images.set_index("image_id")
        for r in truth[truth["kind"] == "exact"].itertuples():
            assert by_id.loc[r.id_a, "bytes"] == by_id.loc[r.id_b, "bytes"]

    def test_reencode_dups_psnr(self, corpus):
        images, truth = corpus
        by_id = images.set_index("image_id")
        for r in truth[truth["kind"] == "reencode"].itertuples():
            a = codecs.decode_image(by_id.loc[r.id_a, "bytes"], by_id.loc[r.id_a, "fmt"])
            b = codecs.decode_image(by_id.loc[r.id_b, "bytes"], by_id.loc[r.id_b, "fmt"])
            assert codecs.psnr(a, b) >= 40.0

"""Tests for the C++ pairs scanner (ctypes, graceful fallback)."""

import os

import pandas as pd
import pytest

from instagraal_tpu.io import pairs as pio
from instagraal_tpu.io.digest import digest_genome
from instagraal_tpu.io.fasta import read_fasta
from instagraal_tpu.native import load_pairs_scan


@pytest.fixture(scope="module")
def dataset(toy_assembly):
    records = read_fasta(toy_assembly["fasta"])
    bins = digest_genome(records, ["DpnII"])
    return toy_assembly["pairs"], bins


class TestNativeScanner:
    def test_library_builds(self):
        assert load_pairs_scan() is not None

    def test_matches_pandas(self, dataset):
        pairs, bins = dataset
        _, cols = pio.read_pairs_header(pairs)
        native = pio._pairs_to_pixels_native(pairs, bins, cols)
        assert native is not None
        npix, ntot = native
        os.environ["INSTAGRAAL_TPU_NATIVE"] = "0"
        try:
            ppix, ptot = pio.pairs_to_pixels(pairs, bins)
        finally:
            del os.environ["INSTAGRAAL_TPU_NATIVE"]
        assert ntot == ptot
        pd.testing.assert_frame_equal(
            npix.reset_index(drop=True), ppix.reset_index(drop=True)
        )

    def test_env_disable(self, dataset):
        pairs, bins = dataset
        os.environ["INSTAGRAAL_TPU_NATIVE"] = "0"
        try:
            assert load_pairs_scan() is None
        finally:
            del os.environ["INSTAGRAAL_TPU_NATIVE"]

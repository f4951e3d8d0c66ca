"""operators/tdigest.py — the reference's vendored t-digest
(MAIN/tdigest/TDigest.java): wire-format structural pins, roundtrip,
merge semantics, and rank-error bounds. Centroid-for-centroid
equality with a particular Java run is NOT the contract (it depends
on buffering order); the byte LAYOUT and the estimator error bounds
are."""

import math
import struct

import numpy as np
import pytest

from presto_0_235_spark.operators import tdigest as td


class TestWireFormat:
    def test_golden_byte_layout(self):
        """Byte-for-byte pin of the TDigest.java:636 serialize layout
        on a hand-built two-centroid digest."""
        d = td.TDigest(
            means=np.array([1.5, 9.0]),
            weights=np.array([2.0, 3.0]),
            min=1.0,
            max=10.0,
            compression=100.0,
            total_weight=5.0,
        )
        data = td.tdigest_serialize(d)
        assert data[0] == 0 and data[1] == 0  # version, type double
        mn, mx, comp, total = struct.unpack_from("<dddd", data, 2)
        assert (mn, mx, comp, total) == (1.0, 10.0, 100.0, 5.0)
        (n,) = struct.unpack_from("<i", data, 34)
        assert n == 2
        assert struct.unpack_from("<2d", data, 38) == (2.0, 3.0)
        assert struct.unpack_from("<2d", data, 54) == (1.5, 9.0)
        assert len(data) == 38 + 16 * 2

    def test_roundtrip_identity(self):
        rng = np.random.default_rng(7)
        d = td.tdigest_build(rng.normal(50, 12, 20000))
        back = td.tdigest_deserialize(td.tdigest_serialize(d))
        assert np.array_equal(back.means, d.means)
        assert np.array_equal(back.weights, d.weights)
        assert (back.min, back.max) == (d.min, d.max)
        assert back.total_weight == d.total_weight

    def test_bad_version_and_type_rejected(self):
        d = td.tdigest_build([1.0, 2.0])
        data = bytearray(td.tdigest_serialize(d))
        data[0] = 1
        with pytest.raises(ValueError, match="Invalid serialization"):
            td.tdigest_deserialize(bytes(data))
        data[0] = 0
        data[1] = 7
        with pytest.raises(ValueError, match="Invalid type"):
            td.tdigest_deserialize(bytes(data))

    def test_foreign_digest_consumable(self):
        """A digest byte-stream NOT produced by this module (centroids
        hand-rolled the way a Java writer would emit them) must yield
        correct quantiles — the 'consume a Presto-serialized digest'
        story."""
        # 1000 points uniform on [0, 1000), pre-clustered into 10
        # equal centroids by the 'foreign' writer
        means = np.arange(50.0, 1000.0, 100.0)
        weights = np.full(10, 100.0)
        data = (
            struct.pack("<bbdddd", 0, 0, 0.0, 999.0, 100.0, 1000.0)
            + struct.pack("<i", 10)
            + weights.astype("<f8").tobytes()
            + means.astype("<f8").tobytes()
        )
        d = td.tdigest_deserialize(data)
        assert abs(td.tdigest_quantile(d, 0.5) - 500) < 15
        assert abs(td.tdigest_quantile(d, 0.9) - 900) < 20
        assert td.tdigest_quantile(d, 0.0) == 0.0
        assert td.tdigest_quantile(d, 1.0) == 999.0


class TestAccuracy:
    @pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
    def test_rank_error_bound(self, dist):
        """Rank error at the probes must stay within ~1% at
        compression 100 (the published t-digest accuracy regime);
        edges are far tighter."""
        rng = np.random.default_rng(42)
        n = 100_000
        x = {
            "uniform": rng.uniform(0, 1000, n),
            "normal": rng.normal(0, 100, n),
            "lognormal": rng.lognormal(3, 1, n),
        }[dist]
        d = td.tdigest_build(x)
        xs = np.sort(x)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            est = td.tdigest_quantile(d, q)
            # translate value error back to rank error
            rank = np.searchsorted(xs, est) / n
            tol = 0.01 if 0.1 <= q <= 0.9 else 0.003
            assert abs(rank - q) < tol, (dist, q, rank)

    def test_centroid_count_bounded(self):
        rng = np.random.default_rng(3)
        d = td.tdigest_build(rng.uniform(0, 1, 200_000))
        assert len(d.means) <= 2 * td.DEFAULT_COMPRESSION

    def test_min_max_and_extreme_quantiles_exact(self):
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, 5000)
        d = td.tdigest_build(x)
        assert td.tdigest_quantile(d, 0.0) == x.min()
        assert td.tdigest_quantile(d, 1.0) == x.max()

    def test_singletons_and_tiny_inputs(self):
        assert math.isnan(td.tdigest_quantile(td.tdigest_build([]), 0.5))
        assert td.tdigest_quantile(td.tdigest_build([7.0]), 0.5) == 7.0
        d = td.tdigest_build([1.0, 2.0, 3.0])
        assert 1.0 <= td.tdigest_quantile(d, 0.5) <= 3.0

    def test_nan_rejected(self):
        with pytest.raises(ValueError, match="NaN"):
            td.tdigest_build([1.0, float("nan")])

    def test_weights_total_conserved(self):
        rng = np.random.default_rng(9)
        d = td.tdigest_build(rng.uniform(0, 1, 50_000))
        assert d.total_weight == pytest.approx(50_000)
        assert d.weights.sum() == pytest.approx(50_000)


class TestMerge:
    def test_merge_equals_whole_within_bound(self):
        """Digest of A ++ B vs merge(digest(A), digest(B)) — same
        rank accuracy; and the merged wire stays bounded."""
        rng = np.random.default_rng(11)
        a = rng.normal(0, 10, 40_000)
        b = rng.normal(50, 5, 60_000)
        merged = td.tdigest_merge(td.tdigest_build(a), td.tdigest_build(b))
        xs = np.sort(np.concatenate([a, b]))
        n = len(xs)
        for q in (0.1, 0.5, 0.9):
            est = td.tdigest_quantile(merged, q)
            rank = np.searchsorted(xs, est) / n
            assert abs(rank - q) < 0.015, q
        assert len(merged.means) <= 2 * td.DEFAULT_COMPRESSION
        assert merged.total_weight == pytest.approx(n)
        assert merged.min == xs[0] and merged.max == xs[-1]

    def test_merge_on_the_wire(self):
        """serialize -> merge deserialized parts == merge of live
        digests (exact: same centroid arithmetic)."""
        rng = np.random.default_rng(13)
        parts = [td.tdigest_build(rng.uniform(0, 1, 10_000)) for _ in range(4)]
        wires = [td.tdigest_serialize(p) for p in parts]
        via_wire = td.tdigest_merge(
            *[td.tdigest_deserialize(w) for w in wires]
        )
        direct = td.tdigest_merge(*parts)
        assert np.array_equal(via_wire.means, direct.means)
        assert np.array_equal(via_wire.weights, direct.weights)

    def test_merge_with_empty(self):
        d = td.tdigest_build([1.0, 2.0, 3.0])
        e = td.tdigest_build([])
        m = td.tdigest_merge(d, e)
        assert m.total_weight == 3.0


class TestCdf:
    def test_cdf_inverse_of_quantile(self):
        rng = np.random.default_rng(17)
        x = rng.normal(0, 1, 50_000)
        d = td.tdigest_build(x)
        xs = np.sort(x)
        for q in (0.1, 0.3, 0.5, 0.7, 0.9):
            v = float(xs[int(q * len(xs))])
            assert abs(td.tdigest_cdf(d, v) - q) < 0.01, q
        assert td.tdigest_cdf(d, xs[0] - 1) == 0.0
        assert td.tdigest_cdf(d, xs[-1] + 1) == 1.0

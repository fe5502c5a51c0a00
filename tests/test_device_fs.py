"""Device Fiat-Shamir transcript must be byte-exact vs the host one."""

import numpy as np
import jax.numpy as jnp
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128, fp64, p256_base
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.random_oracle import device_fs as dfs
from longfellow_zk_tpu.random_oracle.transcript import Transcript


def _roundtrip_state(ts):
    fs = dfs.fs_init_from_host(ts)
    return fs


@pytest.mark.parametrize("field_fn", [
    fp128, pytest.param(fp64, marks=pytest.mark.slow),
    pytest.param(p256_base, marks=pytest.mark.slow),
    gf2_128])
def test_challenges_match_host(field_fn):
    F = field_fn()
    ts = Transcript(b"device fs test", version=7)
    ts.write_bytes(b"some bytes")
    vals = [3, 12345, 7]
    ts.write_elts(vals, F)

    fs = _roundtrip_state(ts)
    # device squeeze of 5 elements from one PRF stream
    prf = dfs.fs_squeeze(fs)
    xs, prf = dfs.dev_sample_elts(F, prf, 5)
    got = [F.from_limbs(np.asarray(xs[..., i])) for i in range(5)]
    want = ts.elts(5, F)
    assert got == want


@pytest.mark.parametrize("field_fn", [
    fp128, pytest.param(gf2_128, marks=pytest.mark.slow)])
def test_interleaved_writes_and_squeezes(field_fn):
    F = field_fn()
    ts = Transcript(b"interleave", version=7)
    fs = _roundtrip_state(ts)

    for i in range(4):
        # host writes
        e = F.of_scalar(1 + i)
        ts.write_elt(e, F)
        ts.write_bytes(bytes(range(i + 1)))
        # device writes (same data)
        el = jnp.asarray(F.to_limbs(e))
        fs = dfs.fs_write_elt(F, fs, el)
        fs = dfs.fs_write_bytes_const(fs, bytes(range(i + 1)))
        # challenge from each must agree
        x, fs = dfs.fs_challenge_elt(F, fs)
        got = F.from_limbs(np.asarray(x))
        want = ts.elt(F)
        assert got == want, i


@pytest.mark.slow
def test_write_elts_matches_host():
    F = fp128()
    ts = Transcript(b"elts", version=7)
    fs = _roundtrip_state(ts)
    vals = [2, 3, 5, 7, 11]
    ts.write_elts(vals, F)
    fs = dfs.fs_write_elts(F, fs, jnp.asarray(F.to_limbs(vals)))
    x, fs = dfs.fs_challenge_elt(F, fs)
    assert F.from_limbs(np.asarray(x)) == ts.elt(F)


def test_state_export_to_host():
    """Device state imports back into a host transcript mid-stream."""
    F = fp128()
    ts = Transcript(b"export", version=7)
    fs = _roundtrip_state(ts)
    fs = dfs.fs_write_elt(F, fs, jnp.asarray(F.to_limbs(42)))
    ts.write_elt(F.of_scalar(42), F)

    ts2 = Transcript(b"", version=7)
    dfs.fs_state_to_host(ts2, {k: np.asarray(v) for k, v in fs.items()})
    assert ts2.elt(F) == ts.elt(F)


def test_absorb_crosses_block_boundaries():
    """Many odd-length writes walking the 64-byte block offset."""
    F = fp128()
    ts = Transcript(b"blocks", version=7)
    fs = _roundtrip_state(ts)
    for n in [1, 63, 64, 65, 17, 55, 128, 3]:
        data = bytes((7 * i + n) % 256 for i in range(n))
        ts.write_bytes(data)
        fs = dfs.fs_write_bytes_const(fs, data)
    x, _ = dfs.fs_challenge_elt(F, fs)
    assert F.from_limbs(np.asarray(x)) == ts.elt(F)

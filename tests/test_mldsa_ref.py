"""Host ML-DSA verification against the reference-shipped example
vectors (mirrors reference ml_dsa_ref_test.cc): real ML-DSA-44/65
signatures must verify; the fail-examples must not."""

import os
import re

import pytest

from longfellow_zk_tpu.circuits.mldsa import MLDSA_44, MLDSA_65, zetas
from longfellow_zk_tpu.circuits.mldsa import reference as ref

REF = "/root/reference/lib/circuits/tests/pq/ml_dsa"


def _load_examples(path: str, getter: str):
    """Parse {msg, pkey, ctx, mu, sig} hexToBytes 5-tuples out of the
    reference example file's `getter` function body."""
    src = open(path).read()
    start = src.index(getter)
    # function body ends at the next 'std::vector<' definition or EOF
    nxt = src.find("GetMlDsa", start + len(getter))
    while nxt != -1 and src[nxt - 1] in "(:": # skip mentions in comments
        nxt = src.find("GetMlDsa", nxt + 1)
    body = src[start : nxt if nxt != -1 else len(src)]
    chunks = re.findall(r"hexToBytes\(((?:\s*\"[0-9a-fA-F]*\")+)\)", body)
    vals = [bytes.fromhex(re.sub(r"[\s\"]", "", c)) for c in chunks]
    assert len(vals) % 5 == 0, len(vals)
    return [tuple(vals[i : i + 5]) for i in range(0, len(vals), 5)]


def test_zetas_computed_match_fips():
    # spot values from ml_dsa_shared.h kZetas
    assert zetas[0] == 1
    assert zetas[1] == 4808194
    assert zetas[2] == 3765607
    assert zetas[255] == 7648983


@pytest.mark.parametrize("params,fname,getter", [
    (MLDSA_44, "ml_dsa_44_examples.cc", "GetMlDsa44Examples"),
    (MLDSA_65, "ml_dsa_65_examples.cc", "GetMlDsa65Examples"),
])
def test_reference_signatures_verify(params, fname, getter):
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip("reference examples unavailable")
    examples = _load_examples(path, getter)
    assert examples, "no examples parsed"
    for msg, pkey, ctx, mu, sig in examples[:2]:
        tr = ref.shake256(pkey, 64)
        assert ref.compute_mu(tr, msg, ctx) == mu
        assert ref.verify(params, pkey, msg, ctx, sig)
        # corrupting the message must fail
        assert not ref.verify(params, pkey, msg + b"x", ctx, sig)


@pytest.mark.parametrize("params,fname,getter", [
    (MLDSA_44, "ml_dsa_44_examples.cc", "GetMlDsa44FailExamples"),
])
def test_reference_fail_examples_fail(params, fname, getter):
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip("reference examples unavailable")
    examples = _load_examples(path, getter)
    assert examples, "no fail examples parsed"
    for msg, pkey, ctx, mu, sig in examples[:2]:
        assert not ref.verify(params, pkey, msg, ctx, sig)

"""Cross-implementation proof interop against the REFERENCE C++ library
(rust/README.md:45 duty: independent implementations must interoperate
at the byte level).

scripts/refcheck/build.sh compiles the reference longfellow-zk headers
(from /root/reference/lib, in place) against a minimal OpenSSL shim
into a prove/verify CLI.  These tests assert, for a shared circuit
serialized by OUR LFC1 writer:

  * proofs produced by OUR prover verify under the REFERENCE verifier;
  * proofs produced by the REFERENCE prover verify under OUR verifier;
  * corrupted proofs are rejected by the reference verifier.

Everything flows through the public wire formats only: LFC1 circuit
bytes (circuit_writer.h), canonical little-endian element encoding
(fp_generic.h:344-380), and the ZkProof serialization (zk_proof.h).
"""

import pathlib
import random
import subprocess

import numpy as np
import pytest

from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit
from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.proto.lfc1 import circuit_id, write_circuit
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.sumcheck.circuit import Circuit, Layer, Quad
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.serialization import read_zk_proof, write_zk_proof
from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION
from longfellow_zk_tpu.zk.verifier import ZkVerifier
from longfellow_zk_tpu.fields.fp_instances import (
    P128_OMEGA,
    P128_OMEGA_ORDER,
    P256_FP2_ROOT_ORDER,
    P256_FP2_ROOT_X,
    P256_FP2_ROOT_Y,
    p256_base,
)
from longfellow_zk_tpu.fields.fp2 import Fp2

REFCHECK_DIR = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "refcheck"
CLI = REFCHECK_DIR / "_build" / "refcheck_cli"

# Small parameters so the reference prover (single-threaded) is quick.
RATE, NREQ = 4, 6

# FieldID values from proto/circuit_io.h:25-36.
FP128_ID = 6
GF2_128_ID = 4
P256_ID = 1


@pytest.fixture(scope="session")
def refcheck_cli():
    """Build the reference CLI once per session (cached binary)."""
    srcs = [
        REFCHECK_DIR / "refcheck_cli.cc",
        REFCHECK_DIR / "shim" / "shim.c",
        REFCHECK_DIR / "build.sh",
    ]
    if (not CLI.exists()
            or any(s.stat().st_mtime > CLI.stat().st_mtime for s in srcs)):
        subprocess.run(["sh", str(REFCHECK_DIR / "build.sh")], check=True,
                       capture_output=True, timeout=600)
    return CLI


def _zk_circuit(F):
    """Tiny pub + x*y == 0 circuit compiled through our QuadCircuit so
    the quad terms are in the Morton-canonical order the reference
    prover's HQuad binding requires (schedule.h:196-273), and the
    circuit id is the canonical content hash the reference reader's
    enforce_circuit_id check recomputes."""
    qc = QuadCircuit(F)
    bk = CompilerBackend(qc)
    L = Logic(bk, F)
    pub = L.eltw_input()
    qc.private_input()
    x = L.eltw_input()
    y = L.eltw_input()
    L.assert0_elt(L.add(pub, L.mul(x, y)))
    circ = qc.mkcircuit(nc=1)
    circ.id = circuit_id(F, circ)
    return circ


def _elts_bytes(F, vals, n):
    """n canonical little-endian elements, zero-padded past len(vals)."""
    out = bytearray()
    for i in range(n):
        out += F.to_bytes(vals[i] if i < len(vals) else F.of_scalar(0))
    return bytes(out)


def _case(F, field_name, field_id, seed):
    circ = _zk_circuit(F)
    rng = random.Random(seed)
    if F.kCharacteristicTwo:
        a, b = rng.getrandbits(128), rng.getrandbits(128)
    else:
        a, b = rng.randrange(F.p), rng.randrange(F.p)
    pubv = F.neg_i(F.mul_i(a, b))
    W = [F.of_scalar(1), pubv, a, b]
    pub = [F.of_scalar(1), pubv]
    return circ, W, pub


def _rs(F):
    if F.kCharacteristicTwo:
        return rs_factory_for(F)
    if F.p == p256_base().p:
        return rs_factory_for(F, F2=Fp2(F),
                              omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                              omega_order=P256_FP2_ROOT_ORDER)
    return rs_factory_for(F, omega=P128_OMEGA, omega_order=P128_OMEGA_ORDER)


def _run_cli(cli, mode, field_name, circuit_path, aux_path, proof_path):
    return subprocess.run(
        [str(cli), mode, field_name, str(circuit_path), str(aux_path),
         str(proof_path), str(RATE), str(NREQ)],
        capture_output=True, text=True, timeout=600)


def _interop(refcheck_cli, tmp_path, F, field_name, field_id, seed):
    circ, W, pub = _case(F, field_name, field_id, seed)
    factory = _rs(F)

    cpath = tmp_path / "circuit.lfc1"
    cpath.write_bytes(write_circuit(F, field_id, circ))
    wpath = tmp_path / "witness.bin"
    wpath.write_bytes(_elts_bytes(F, W, circ.ninputs))
    ppath = tmp_path / "pub.bin"
    ppath.write_bytes(_elts_bytes(F, pub, circ.ninputs))

    # ---- direction B: reference proves, we verify -------------------
    ref_proof = tmp_path / "ref.proof"
    r = _run_cli(refcheck_cli, "prove", field_name, cpath, wpath, ref_proof)
    assert r.returncode == 0, f"reference prover failed: {r.stderr}"

    prover = ZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
    zkp2 = read_zk_proof(ref_proof.read_bytes(), circ, prover.param, F,
                         RATE, NREQ)
    assert zkp2 is not None, "our reader rejected the reference proof bytes"
    verifier = ZkVerifier(circ, F, factory, rate=RATE, nreq=NREQ)
    tv = Transcript(b"zk_test", version=K_VERSION)
    verifier.recv_commitment(zkp2, tv)
    ok, why = verifier.verify(zkp2, pub, tv)
    assert ok, f"our verifier rejected the reference proof: {why}"

    # ---- direction A: we prove, reference verifies ------------------
    zkp = ZkProof(rate=RATE, nreq=NREQ)
    tp = Transcript(b"zk_test", version=K_VERSION)
    prover.commit(zkp, W, tp, DeterministicEngine())
    assert prover.prove(zkp, W, tp)
    our_proof = tmp_path / "our.proof"
    our_proof.write_bytes(write_zk_proof(zkp, circ, prover.param, F))

    r = _run_cli(refcheck_cli, "verify", field_name, cpath, ppath, our_proof)
    assert r.returncode == 0, f"reference verifier rejected our proof: {r.stderr}"

    # ---- corrupted proof must be rejected by the reference ----------
    raw = bytearray(our_proof.read_bytes())
    raw[len(raw) // 2] ^= 1
    bad = tmp_path / "bad.proof"
    bad.write_bytes(bytes(raw))
    r = _run_cli(refcheck_cli, "verify", field_name, cpath, ppath, bad)
    assert r.returncode != 0, "reference verifier accepted a corrupted proof"


def test_refcheck_fp128(refcheck_cli, tmp_path):
    _interop(refcheck_cli, tmp_path, fp128(), "fp128", FP128_ID, seed=31)


@pytest.mark.slow
def test_refcheck_gf2128(refcheck_cli, tmp_path):
    _interop(refcheck_cli, tmp_path, gf2_128(), "gf2128", GF2_128_ID, seed=32)


@pytest.mark.slow
def test_refcheck_p256(refcheck_cli, tmp_path):
    _interop(refcheck_cli, tmp_path, p256_base(), "p256", P256_ID, seed=33)


# ---------------------------------------------------------------------------
# mdoc-scale interop (the reference's own bar: bit-level proof interop
# on the real application, rust/README.md:45)
# ---------------------------------------------------------------------------

MDOC_CLI = REFCHECK_DIR / "_build" / "mdoc_bench_cli"


def _mdoc_fixture():
    import json as _json

    from longfellow_zk_tpu.circuits.mdoc.zk_spec import (
        find_zk_spec_by_version)

    spec = find_zk_spec_by_version(7, 1)
    cpath = pathlib.Path("/root/reference/lib/circuits/mdoc/circuits") \
        / spec.circuit_hash
    if not cpath.exists():
        pytest.skip("reference mdoc circuits not present")
    ex = _json.load(open(pathlib.Path(__file__).parent.parent
                         / "artifacts" / "mdoc_examples.json"))[0]
    return spec, cpath, ex


@pytest.mark.slow
def test_mdoc_interop_ref_proof_verifies_here(tmp_path):
    """REFERENCE C++ run_mdoc_prover proof bytes -> OUR
    run_mdoc_verifier (mdoc_zk.h:180-192)."""
    from longfellow_zk_tpu.circuits.mdoc import api
    from longfellow_zk_tpu.circuits.mdoc.witness import RequestedAttribute

    spec, cpath, ex = _mdoc_fixture()
    if not MDOC_CLI.exists():
        subprocess.run(["sh", str(REFCHECK_DIR / "build.sh")], check=True,
                       capture_output=True, timeout=900)
    pf = tmp_path / "ref_proof.bin"
    out = subprocess.run([str(MDOC_CLI), str(cpath), "prove-out", str(pf)],
                         capture_output=True, text=True, timeout=600)
    assert "INTEROP_PROVE_OK" in out.stdout, out.stderr
    cb = cpath.read_bytes()
    ok = api.run_mdoc_verifier(
        cb, int(ex["pkx"], 16), int(ex["pky"], 16),
        bytes.fromhex(ex["transcript"]),
        [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")],
        ex["now"].encode(), pf.read_bytes(),
        b"org.iso.18013.5.1.mDL", spec)
    assert ok


@pytest.mark.slow
def test_mdoc_interop_our_proof_verifies_there(tmp_path):
    """OUR run_mdoc_prover proof bytes -> REFERENCE C++
    run_mdoc_verifier."""
    from longfellow_zk_tpu.circuits.mdoc import api
    from longfellow_zk_tpu.circuits.mdoc.witness import RequestedAttribute
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine

    spec, cpath, ex = _mdoc_fixture()
    if not MDOC_CLI.exists():
        subprocess.run(["sh", str(REFCHECK_DIR / "build.sh")], check=True,
                       capture_output=True, timeout=900)
    cb = cpath.read_bytes()
    proof = api.run_mdoc_prover(
        cb, bytes.fromhex(ex["mdoc"]), int(ex["pkx"], 16),
        int(ex["pky"], 16), bytes.fromhex(ex["transcript"]),
        [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")],
        ex["now"].encode(), spec, rng=SecureRandomEngine())
    pf = tmp_path / "our_proof.bin"
    pf.write_bytes(proof)
    out = subprocess.run([str(MDOC_CLI), str(cpath), "verify-in", str(pf)],
                         capture_output=True, text=True, timeout=600)
    assert "INTEROP_VERIFY_OK" in out.stdout, (out.stdout, out.stderr)

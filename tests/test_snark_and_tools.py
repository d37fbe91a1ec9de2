"""SNARK-pipeline components (sans zokrates binary), debug tooling, and the
benchmark harness plumbing."""

import os

import numpy as np
import pytest

from zk_stark_project_tpu.analytics.harness import stats_row
from zk_stark_project_tpu.ops.mimc_bn254 import (ROUND_CONSTANTS,
                                                 SNARK_SCALAR_FIELD,
                                                 convert_matrix, mimc,
                                                 mimc_hash)
from zk_stark_project_tpu.snark import (aggregator_circuit,
                                        aggregator_witness, args_parser,
                                        training_circuit, training_witness)


def test_mimc_bn254_basics():
    assert len(ROUND_CONSTANTS) == 64
    assert ROUND_CONSTANTS[0] == 42
    assert ROUND_CONSTANTS[-1] == 3938980639125
    # deterministic + in-field
    d = mimc(123, 456)
    assert 0 <= d < SNARK_SCALAR_FIELD
    assert d == mimc(123, 456)
    # sponge interleaving: order matters
    h1 = mimc_hash([[1, 2]], [3])
    h2 = mimc_hash([[2, 1]], [3])
    assert h1 != h2


def test_convert_matrix_signs():
    vals, signs = convert_matrix(np.array([[1, -2], [0, 3]], dtype=object))
    assert vals[0][0] == 1 and signs[0][0] == 0
    assert vals[0][1] == SNARK_SCALAR_FIELD - 2 and signs[0][1] == 1
    assert signs[1][0] == 1  # reference: sign(0) = 1 (`hash.py:79`)


def test_training_witness_shape():
    args = training_witness(batch=2, seed=0)
    # w(54) + w_sign(54) + b(6) + b_sign(6) + x(18) + x_sign(18) + y(2)
    # + lr + pr + new_w(54) + new_b(6) + ldigest + gdigest
    assert len(args) == 54 + 54 + 6 + 6 + 18 + 18 + 2 + 2 + 54 + 6 + 2
    # faithful to the reference witness generator (`analyze.py:235-259`):
    # the SGD runs on the FIELD-ENCODED samples, so intermediate magnitudes
    # exceed the field and convert_matrix's single-complement mapping can
    # emit negative literals — exactly what the reference feeds zokrates
    assert all(a.lstrip("-").isdigit() for a in args)
    # deterministic under the seed
    assert args == training_witness(batch=2, seed=0)
    assert args != training_witness(batch=2, seed=1)


def test_aggregator_witness_shape():
    c = 4
    args = aggregator_witness(c=c, seed=0)
    per_client = 54 + 6
    expected = (c * per_client * 2          # local w/b + signs
                + 54 + 54 + 6 + 6           # global w/b + signs
                + c                          # lhashes
                + 54 + 54 + 6 + 6            # expected w/b + signs
                + 1)                         # gdigest
    assert len(args) == expected


def test_circuit_emission():
    src = training_circuit(fe=9, ac=6, bs=5)
    assert "const u32 bs = 5;" in src
    assert "def main(" in src and "mimc_hash" in src
    assert str(ROUND_CONSTANTS[-1]) in src
    agg = aggregator_circuit(c=8)
    assert "const u32 c = 8;" in agg
    assert "local_hash_contains" in agg


def test_debug_tooling(np_rng, tmp_path):
    from zk_stark_project_tpu.models.ml_math import AC, FE
    from zk_stark_project_tpu.models.training import TrainingUpdateProver
    from zk_stark_project_tpu.models import ml_math
    from zk_stark_project_tpu.ops.signed import f64_to_felt
    from zk_stark_project_tpu.prover import debug, fast_options

    w, ws, b, bs = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(1.0)] * FE]
    y = [ml_math.label_to_one_hot(2.0, AC, 1e6)]
    p = TrainingUpdateProver(fast_options(), w, b, ws, bs, x, [[0] * FE],
                             y, f64_to_felt(1e-4), f64_to_felt(1e6), 1,
                             rng=np_rng)
    trace = p.build_trace()
    assert debug.verify_trace_transitions(trace, 1) == []
    info = debug.analyze_trace(trace)
    assert info["width"] == 240 and info["raw_cells_changed"] > 0
    csv_path = str(tmp_path / "trace.csv")
    debug.export_trace_csv(trace, csv_path)
    assert os.path.getsize(csv_path) > 0
    tracer = debug.DebugTracer()
    tracer.record(0, "fwd", [1, 2, 3])
    tracer.export_csv(str(tmp_path / "events.csv"))
    assert os.path.getsize(str(tmp_path / "events.csv")) > 0


def test_stats_row():
    s = stats_row([1.0, 1.1, 0.9, 5.0])
    assert s["mean"] == pytest.approx(2.0)
    assert s["outliers"] == 0 or s["outliers"] >= 0  # smoke
    assert stats_row([])["mean"] == 0.0


REFERENCE_ZOK = "/root/reference/verification/zokrates"


def _zok_norm(src):
    import re

    src = re.sub(r"//[^\n]*", "", src)
    return [re.sub(r"\s+", "", l) for l in src.splitlines() if l.strip()]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ZOK),
                    reason="reference checkout not present")
def test_circuits_match_reference_golden():
    """At the reference dimensions the emitted circuits must equal the
    reference .zok sources exactly, modulo whitespace and comments — the
    circuit IS the benchmark statement (quirks included; see
    snark/circuits.py docstring)."""
    got = _zok_norm(training_circuit(9, 6, 20))
    want = _zok_norm(open(os.path.join(REFERENCE_ZOK, "root.zok")).read())
    assert got == want
    got = _zok_norm(aggregator_circuit(9, 6, 8))
    want = _zok_norm(
        open(os.path.join(REFERENCE_ZOK, "aggregator", "root.zok")).read())
    assert got == want


def test_circuit_grammar_sanity():
    """Vendored ZoKrates-shaped sanity check (the binary is unavailable
    here): balanced braces/parens/brackets, import/const lines end with
    ';', every function has a return type arrow, and a main exists."""
    import re

    for src in (training_circuit(3, 2, 4), aggregator_circuit(3, 2, 2)):
        assert src.count("{") == src.count("}")
        assert src.count("(") == src.count(")")
        assert src.count("[") == src.count("]")
        body = re.sub(r"//[^\n]*", "", src)
        for line in body.splitlines():
            st = line.strip()
            if st.startswith(("import", "const")):
                assert st.endswith(";"), st
        defs = re.findall(r"def (\w+)\(", body)
        assert "main" in defs
        assert len(re.findall(r"-> ?\(?(?:bool|field)", body)) >= len(defs)


# ---------------------------------------------------------------------------
# Vendored Groth16 Solidity verifier fixtures (component #27)
# ---------------------------------------------------------------------------

FIXTURES = os.path.join(os.path.dirname(__file__), "..",
                        "zk_stark_project_tpu", "snark", "fixtures")


@pytest.mark.parametrize("fname,contract,gamma_abc_len", [
    ("verifier.sol", "contract Verifier", 6),
    ("verifier_aggregator.sol", "contract VerifierAggregator", 11),
    ("aggregator_verifier.sol", "contract Verifier", 11),
])
def test_vendored_solidity_verifiers(fname, contract, gamma_abc_len):
    """The vendored ZoKrates-exported Groth16 verifiers (provenance:
    snark/fixtures/README.md) must have the standard structure and a
    verifying key sized to the circuit's public-input count:

      * training circuit (root.zok:146): 4 public inputs + bool return
        -> gamma_abc length 6;
      * aggregator circuit (aggregator/root.zok:143): c=8 sc_lhashes +
        gdigest + bool return -> gamma_abc length 11.
    """
    import re

    path = os.path.join(FIXTURES, fname)
    src = open(path).read()
    assert contract in src
    assert "function verifyTx" in src
    # BN254 pairing precompiles (add=6, mul=7, pairing=8) via staticcall
    for addr in (", 6,", ", 7,", ", 8,"):
        assert re.search(r"staticcall\(sub\(gas\(\), 2000\)" +
                         re.escape(addr), src), f"precompile{addr} missing"
    # BN254 field/scalar moduli
    assert ("21888242871839275222246405745257275088696311157297823662689"
            "037894645226208583") in src      # base field q
    assert ("21888242871839275222246405745257275088548364400416034343698"
            "204186575808495617") in src      # scalar field r
    n_vk = len(re.findall(r"gamma_abc\[\d+\] ?=", src))
    assert n_vk == gamma_abc_len
    # input array sized to public-input count (gamma_abc_len - 1)
    assert f"uint[{gamma_abc_len - 1}] memory input" in src


def test_harness_targets_fixture_filename():
    """`run_snark_pipeline`'s export step writes the same filename the
    fixture was vendored under (verifier.sol), so a zokrates-equipped run
    produces a drop-in replacement for the golden artifact."""
    import inspect

    from zk_stark_project_tpu.snark import harness

    src = inspect.getsource(harness.run_snark_pipeline)
    assert "export-verifier" in src
    assert '"verifier.sol"' in src
    assert os.path.exists(os.path.join(FIXTURES, "verifier.sol"))

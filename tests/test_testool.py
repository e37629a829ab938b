"""testool state-test runner: oneliner + JSON filler + executor levels."""

import json

import pytest

from zkevm_circuits_tpu.testool import (
    AccountState, CircuitsConfig, StateTest, load_json_fillers,
    parse_oneliner, run_state_test,
)

FILLER = {
    "sstoreGas": {
        "env": {
            "currentCoinbase": "0x2adc25665018aa1fe0e6bc666dac8fc2697ff9ba",
            "currentGasLimit": "0x05f5e100",
            "currentNumber": "1",
            "currentTimestamp": "1000",
        },
        "pre": {
            "0x095e7baea6a6c7c4c2dfeb977efac326af552d87": {
                "balance": "1000000000000000000",
                "code": ":raw 0x600160010160005500",  # 1+1 -> slot 0
                "nonce": "0",
                "storage": {},
            },
            "0xa94f5374fce5edbc8e2a8697c15331677e6ebf0b": {
                "balance": "1000000000000000000",
                "code": "0x",
                "nonce": "0",
                "storage": {},
            },
        },
        "transaction": {
            "data": ["0x"],
            "gasLimit": ["400000"],
            "gasPrice": "10",
            "nonce": "0",
            "secretKey": "0x45a915e4d060149eb4365960e6a7a45f334393093061116b197e3240065ff2d8",
            "sender": "0xa94f5374fce5edbc8e2a8697c15331677e6ebf0b",
            "to": "0x095e7baea6a6c7c4c2dfeb977efac326af552d87",
            "value": ["100000"],
        },
        "expect": [
            {
                "indexes": {"data": -1, "gas": -1, "value": -1},
                "result": {
                    "0x095e7baea6a6c7c4c2dfeb977efac326af552d87": {
                        "storage": {"0x00": "0x02"}
                    }
                },
            }
        ],
    }
}


def test_json_filler_parse_and_trace():
    tests = load_json_fillers(json.dumps(FILLER))
    assert len(tests) == 1
    t = tests[0]
    assert t.tx_to == 0x095E7BAEA6A6C7C4C2DFEB977EFAC326AF552D87
    assert t.expect[t.tx_to].storage == {0: 2}
    r = run_state_test(t, CircuitsConfig(level="trace"))
    assert r.ok and not r.skipped, r.reason


def test_json_filler_witness_level():
    tests = load_json_fillers(json.dumps(FILLER))
    r = run_state_test(tests[0], CircuitsConfig(level="witness"))
    assert r.ok and not r.skipped, r.reason


def test_json_filler_mock_level():
    tests = load_json_fillers(json.dumps(FILLER))
    r = run_state_test(tests[0], CircuitsConfig(level="mock", k=9))
    assert r.ok and not r.skipped, r.reason


@pytest.mark.slow
def test_json_filler_prove_level():
    """The reference's inner-prove CI level: the state test's
    SuperCircuit is REALLY proven and verified (executor.rs:81)."""
    tests = load_json_fillers(json.dumps(FILLER))
    r = run_state_test(tests[0], CircuitsConfig(level="prove", k=9))
    assert r.ok and not r.skipped, r.reason


def test_wrong_expectation_fails():
    doc = json.loads(json.dumps(FILLER))
    target = "0x095e7baea6a6c7c4c2dfeb977efac326af552d87"
    doc["sstoreGas"]["expect"][0]["result"][target]["storage"]["0x00"] = "0x03"
    r = run_state_test(load_json_fillers(json.dumps(doc))[0])
    assert not r.ok and "storage" in r.reason


def test_oneliner_call_with_storage_check():
    # store CALLVALUE equality with slot 0 into slot 1
    spec = ("call;;2000 "
            "12;PUSH1(0),SLOAD,CALLVALUE,EQ,PUSH1(1),SSTORE,STOP;;00:7d0")
    st = parse_oneliner(spec)
    st.expect = {0x12: AccountState(storage={1: 1})}
    r = run_state_test(st, CircuitsConfig(level="witness"))
    assert r.ok, r.reason


def test_oneliner_mock_level():
    st = parse_oneliner("call 12;PUSH1(3),PUSH1(4),MUL,PUSH1(0),SSTORE,STOP")
    st.expect = {0x12: AccountState(storage={0: 12})}
    r = run_state_test(st, CircuitsConfig(level="mock", k=9))
    assert r.ok and not r.skipped, r.reason


def test_runner_cli(tmp_path, capsys):
    from zkevm_circuits_tpu.testool.runner import main

    f = tmp_path / "filler.json"
    f.write_text(json.dumps(FILLER))
    rc = main(["--path", str(f), "--level", "trace"])
    out = capsys.readouterr().out
    assert rc == 0 and "1 passed" in out


def test_oneliner_precompile_identity_mock():
    # store input, call identity (0x04), SSTORE the MLOADed result
    spec = ("call 12;"
            "PUSH1(0x2A),PUSH1(0),MSTORE,"          # mem[0:32] = 42
            "PUSH1(32),PUSH1(64),PUSH1(32),PUSH1(0),PUSH1(0),PUSH1(4),"
            "PUSH2(0xFFFF),CALL,POP,"
            "PUSH1(64),MLOAD,PUSH1(0),SSTORE,STOP")
    st = parse_oneliner(spec)
    st.expect = {0x12: AccountState(storage={0: 0x2A})}
    r = run_state_test(st, CircuitsConfig(level="mock", k=10))
    assert r.ok and not r.skipped, r.reason

"""Headless CLI (reference src/cli.rs surface)."""
import os

import numpy as np
import pytest

from molchanica_tpu.cli import CliError, CliState, handle_cmd


@pytest.fixture()
def st():
    s = CliState()
    handle_cmd(s, "load smiles:CC(=O)O")
    return s


def test_load_show(st):
    out = handle_cmd(st, "show")
    assert "atoms" in out


def test_select_and_remove(st):
    out = handle_cmd(st, "select elem O")
    assert "2 atoms" in out
    n0 = st.active_mol().n_atoms
    handle_cmd(st, "remove sel")
    assert st.active_mol().n_atoms == n0 - 2


def test_save_load_roundtrip(st, tmp_path):
    p = str(tmp_path / "m.sdf")
    handle_cmd(st, f"save {p}")
    st2 = CliState()
    out = handle_cmd(st2, f"load {p}")
    assert "atoms" in out
    assert st2.active_mol().n_atoms == st.active_mol().n_atoms


def test_characterize(st):
    out = handle_cmd(st, "characterize")
    assert "cLogP" in out and "TPSA" in out


@pytest.mark.heavy
def test_energy_and_minimize(st):
    e1 = handle_cmd(st, "energy")
    assert "energy_potential" in e1
    out = handle_cmd(st, "minimize 50")
    assert "E =" in out


def test_session_roundtrip(st, tmp_path):
    p = str(tmp_path / "s.json")
    handle_cmd(st, f"select elem C")
    handle_cmd(st, f"session save {p}")
    st2 = CliState()
    out = handle_cmd(st2, f"session load {p}")
    assert "1 molecules" in out
    assert st2.active_mol().n_atoms == st.active_mol().n_atoms


def test_errors():
    st = CliState()
    with pytest.raises(CliError):
        handle_cmd(st, "energy")            # nothing loaded
    with pytest.raises(CliError):
        handle_cmd(st, "fetch 1abc")        # offline
    with pytest.raises(CliError):
        handle_cmd(st, "frobnicate")        # unknown


def test_predict_via_cli():
    st = CliState()
    out = handle_cmd(st, "predict lipophilicity_astrazeneca CCO")
    assert "lipophilicity" in out
    float(out.split("=")[1])               # parses as a number


def test_main_batch(tmp_path, capsys):
    from molchanica_tpu.cli import main
    rc = main(["load smiles:CCO", "show"])
    assert rc == 0
    assert "atoms" in capsys.readouterr().out


def test_fetch_from_embedded_db():
    """`fetch <name>` resolves offline from the embedded DBs (the
    reference's embedded HMDB/ChEBI lookup, state.rs:88-104)."""
    from molchanica_tpu.cli import CliState, handle_cmd

    st = CliState()
    out = handle_cmd(st, "fetch glucose")
    assert "glucose" in out and "24 atoms" in out
    assert st.active == "glucose"
    # coordinates were embedded (non-degenerate geometry)
    import numpy as np
    x = np.asarray(st.mols["glucose"].positions)
    assert np.ptp(x, axis=0).min() > 0.5

    import pytest
    from molchanica_tpu.cli import CliError
    with pytest.raises(CliError, match="not in the embedded databases"):
        handle_cmd(st, "fetch definitely-not-a-molecule")


def test_task_registry_basic():
    """TaskRegistry: submit/poll-exactly-once/join + error surfacing
    (reference ThreadReceivers contract, src/threads.rs:32-77)."""
    import time

    from molchanica_tpu.tasks import TaskError, TaskRegistry

    reg = TaskRegistry()
    h1 = reg.submit("ok", lambda: 41 + 1)
    h2 = reg.submit("boom", lambda: 1 / 0)
    assert h1.join(10.0) == 42
    try:
        h2.join(10.0)
        assert False, "expected TaskError"
    except TaskError as e:
        assert "division" in str(e)
    time.sleep(0.05)
    drained = dict(reg.poll())
    assert set(drained) == {h1.name, h2.name}
    assert reg.poll() == []          # exactly-once delivery
    assert reg.running() == []


def test_cli_bg_md_roundtrip():
    """bg md runs in the background; tasks/wait collect the result and
    merge the moved molecule back into the live session."""
    from molchanica_tpu.cli import CliState, handle_cmd
    from molchanica_tpu.molecules.smiles import from_smiles
    from molchanica_tpu.molecules.embed import embed_3d

    st = CliState()
    mol = from_smiles("CO")
    embed_3d(mol)
    st.mols["meoh"] = mol
    st.active = "meoh"
    x0 = np.asarray(mol.positions).copy()
    out = handle_cmd(st, "bg md 50 0.0005")
    assert "launched task" in out
    name = out.split("'")[1]
    out = handle_cmd(st, f"wait {name}")
    assert "done in" in out and "T =" in out
    assert not np.allclose(np.asarray(st.mols["meoh"].positions), x0)

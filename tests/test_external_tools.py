

def test_install_management_surface(tmp_path, monkeypatch):
    """Managed-install plumbing (reference external_tools/mod.rs:319-399):
    env overrides, managed venv resolution, install gating, uninstall."""
    import os

    from molchanica_tpu import external_tools as et

    monkeypatch.setenv("MOLCHANICA_TPU_TOOLS_DIR", str(tmp_path))
    # managed venv dir layout
    assert et.managed_dir("anarcii") == str(tmp_path / "anarcii")

    # env override wins the probe
    fake = tmp_path / "fake_gmx"
    fake.write_text("#!/bin/sh\necho fake\n")
    fake.chmod(0o755)
    monkeypatch.setenv("MOLCHANICA_TPU_GROMACS_EXECUTABLE", str(fake))
    st = et.probe("gromacs")
    assert st.available and st.path == str(fake)

    # a managed-venv binary resolves without PATH
    mbin = tmp_path / "mdtraj" / "bin"
    mbin.mkdir(parents=True)
    exe = mbin / "mdconvert"
    exe.write_text("#!/bin/sh\necho 1.0\n")
    exe.chmod(0o755)
    st2 = et.probe("mdtraj")
    assert st2.available and st2.path == str(exe)

    # uninstall removes the managed dir
    assert et.uninstall("mdtraj") is True
    assert not (tmp_path / "mdtraj").exists()
    assert et.uninstall("mdtraj") is False

    # tools without a pip package refuse managed install with guidance
    import pytest
    with pytest.raises(RuntimeError, match="no managed pip package"):
        et.install("gromacs")

"""External-tools registry: discovery, availability, invocation.

Reference parity: src/external_tools/mod.rs — a registry of external
programs (GROMACS, ORCA, LigandMPNN, ANARCI, IgBLAST...) with per-tool
specs (kind, how to install, availability probing) and managed
invocation. Installation management is environment-specific; this
registry covers the discovery/availability/run surface so workloads can
gate on tool presence uniformly.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional, Sequence


class ToolKind(Enum):
    MD_ENGINE = "md_engine"
    QM = "qm"
    SEQUENCE = "sequence"
    STRUCTURE_ML = "structure_ml"


@dataclass(frozen=True)
class ToolSpec:
    name: str
    kind: ToolKind
    executables: tuple                 # candidate binary names
    description: str = ""
    version_args: tuple = ("--version",)


REGISTRY: Dict[str, ToolSpec] = {
    "gromacs": ToolSpec(
        "gromacs", ToolKind.MD_ENGINE, ("gmx", "gmx_mpi"),
        "GROMACS MD engine (grompp/mdrun round trips)"),
    "orca": ToolSpec(
        "orca", ToolKind.QM, ("orca",),
        "ORCA quantum chemistry", version_args=()),
    "anarci": ToolSpec(
        "anarci", ToolKind.SEQUENCE, ("ANARCI", "anarci"),
        "antibody numbering"),
    "igblast": ToolSpec(
        "igblast", ToolKind.SEQUENCE, ("igblastn", "igblastp"),
        "immunoglobulin BLAST"),
    "ligandmpnn": ToolSpec(
        "ligandmpnn", ToolKind.STRUCTURE_ML, ("ligandmpnn",),
        "LigandMPNN sequence design"),
}


@dataclass
class ToolStatus:
    spec: ToolSpec
    available: bool
    path: Optional[str] = None
    version: Optional[str] = None


def probe(name: str) -> ToolStatus:
    """Availability + version of one registered tool."""
    spec = REGISTRY[name]
    for exe in spec.executables:
        path = shutil.which(exe)
        if path:
            version = None
            if spec.version_args:
                try:
                    r = subprocess.run(
                        [path, *spec.version_args], capture_output=True,
                        text=True, timeout=10)
                    version = (r.stdout or r.stderr).splitlines()[0][:120] \
                        if (r.stdout or r.stderr) else None
                except Exception:
                    pass
            return ToolStatus(spec, True, path, version)
    return ToolStatus(spec, False)


def available_tools() -> List[str]:
    return [n for n in REGISTRY if probe(n).available]


def require(name: str) -> str:
    """Path of a required tool, or a clear error."""
    st = probe(name)
    if not st.available:
        raise RuntimeError(
            f"external tool {name!r} ({st.spec.description}) is not "
            f"installed; looked for {st.spec.executables}")
    return st.path


def run_tool(name: str, args: Sequence[str], cwd=None, timeout=600,
             env: Optional[dict] = None) -> subprocess.CompletedProcess:
    """Managed invocation (captured output, bounded runtime)."""
    path = require(name)
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    return subprocess.run([path, *args], cwd=cwd, capture_output=True,
                          text=True, timeout=timeout, env=full_env)

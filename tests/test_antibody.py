"""Antibody CDR annotation + liability flags
(reference external_tools/{anarcii,igblast}.rs adapters)."""
import pytest

from molchanica_tpu.antibody import (
    CdrAnnotation, annotate_cdrs, humanness_flags)

# public trastuzumab VH; CDR-H3 is the documented WGGDGFYAMDY
TRASTUZUMAB_VH = (
    "EVQLVESGGGLVQPGGSLRLSCAASGFNIKDTYIHWVRQAPGKGLEWVARIYPTNGYTRYADSVKG"
    "RFTISADTSKNTAYLQMNSLRAEDTAVYYCSRWGGDGFYAMDYWGQGTLVTVSS")


def test_cdr3_recovered():
    ann = annotate_cdrs(TRASTUZUMAB_VH)
    assert isinstance(ann, CdrAnnotation)
    loops = ann.loops(TRASTUZUMAB_VH)
    assert "WGGDGFYAMDY" in loops["CDR3"]
    assert ann.chain_type == "H"
    assert loops["CDR1"].startswith("GFNIK")


def test_liability_flags():
    flags = humanness_flags(TRASTUZUMAB_VH)
    # the known H2 'NG' deamidation motif
    assert flags["deamidation_NG"] is True
    assert flags["unpaired_cys"] is False


def test_rejects_non_ig():
    with pytest.raises(ValueError):
        annotate_cdrs("AAAAAAAAAA")

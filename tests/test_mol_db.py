

def test_embedded_dbs():
    """Embedded HMDB/ChEBI-analog databases ship with the package
    (reference state.rs:88-104 loads embedded parquet DBs at startup)."""
    from molchanica_tpu.mol_db import (EMBEDDED_DBS, load_embedded_dbs,
                                       lookup_by_name)

    dbs = load_embedded_dbs()
    assert set(dbs) == set(EMBEDDED_DBS)
    meta = dbs["metabolites_hmdb_core"]
    assert len(meta) > 80
    assert "name" in meta.df.columns and "clogp" in meta.df.columns

    hit = lookup_by_name("glucose", dbs)
    assert hit is not None
    db_name, row = hit
    assert db_name == "metabolites_hmdb_core"
    assert row.hba >= 5          # sugar: many acceptors

    hit2 = lookup_by_name("Aspirin", dbs)     # case-insensitive
    assert hit2 is not None and hit2[0] == "compounds_chebi_core"

    # druglike filtering works on the embedded sets
    assert 0 < len(dbs["compounds_chebi_core"].filter_druglike()) <= \
        len(dbs["compounds_chebi_core"])

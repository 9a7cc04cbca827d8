"""The self-assembled FileDescriptorSet (codec.descriptor) must be a
structurally valid descriptor: every message/field/enum from codec.messages
present with the right numbers/types/labels, every type_name resolvable,
proto3 syntax — verified by parsing the bytes with the repo's own wire
reader against the PUBLIC descriptor.proto field numbers. The from_protobuf
integration itself is exercised only when the spark-protobuf classes exist
on the session classpath (skip-gated: this sandbox ships no such jar)."""

from __future__ import annotations

import pytest

from consensource_sds_spark.codec import wire
from consensource_sds_spark.codec.descriptor import (
    _ENUM_OWNER,
    PACKAGE,
    decode_backend,
    file_descriptor_set,
    jvm_available,
)
from consensource_sds_spark.codec.messages import ENUMS, MESSAGES


def _fields(buf: bytes):
    return list(wire.iter_fields(bytes(buf)))


def _parse_enum(buf):
    name, values = None, []
    for fnum, _, raw in _fields(buf):
        if fnum == 1:
            name = raw.decode()
        elif fnum == 2:
            vname, vnum = None, 0
            for f2, _, r2 in _fields(raw):
                if f2 == 1:
                    vname = r2.decode()
                elif f2 == 2:
                    vnum = r2
            values.append((vname, vnum))
    return name, values


def _parse_field(buf):
    out = {"number": 0, "label": 1, "type": None, "type_name": None, "name": None}
    for fnum, _, raw in _fields(buf):
        if fnum == 1:
            out["name"] = raw.decode()
        elif fnum == 3:
            out["number"] = raw
        elif fnum == 4:
            out["label"] = raw
        elif fnum == 5:
            out["type"] = raw
        elif fnum == 6:
            out["type_name"] = raw.decode()
    return out


def _parse_message(buf):
    name, fields, enums = None, [], {}
    for fnum, _, raw in _fields(buf):
        if fnum == 1:
            name = raw.decode()
        elif fnum == 2:
            fields.append(_parse_field(raw))
        elif fnum == 4:
            ename, evals = _parse_enum(raw)
            enums[ename] = evals
    return name, fields, enums


def _parse_set(buf):
    files = []
    for fnum, _, raw in _fields(buf):
        assert fnum == 1  # FileDescriptorSet.file
        files.append(raw)
    assert len(files) == 1
    fname, package, syntax, messages = None, None, None, {}
    for fnum, _, raw in _fields(files[0]):
        if fnum == 1:
            fname = raw.decode()
        elif fnum == 2:
            package = raw.decode()
        elif fnum == 12:
            syntax = raw.decode()
        elif fnum == 4:
            mname, mfields, menums = _parse_message(raw)
            messages[mname] = (mfields, menums)
    return fname, package, syntax, messages


def test_descriptor_set_structure():
    fname, package, syntax, messages = _parse_set(file_descriptor_set())
    assert fname == f"{PACKAGE}.proto" and package == PACKAGE and syntax == "proto3"
    assert set(messages) == set(MESSAGES)

    kind_type = {"string": 9, "rep_string": 9, "bytes": 12, "uint64": 4}
    for mname, table in MESSAGES.items():
        fields, enums = messages[mname]
        assert [f["name"] for f in fields] == [table[n][0] for n in sorted(table)]
        for f, fnum in zip(fields, sorted(table)):
            fname_, kind = table[fnum]
            assert f["number"] == fnum
            assert f["label"] == (3 if kind.startswith("rep") else 1)
            if kind in kind_type:
                assert f["type"] == kind_type[kind]
            elif kind.startswith("enum:"):
                e = kind[5:]
                assert f["type"] == 14
                assert f["type_name"] == f".{PACKAGE}.{_ENUM_OWNER[e]}.{e}"
            else:
                target = kind.split(":", 1)[1]
                assert f["type"] == 11
                assert f["type_name"] == f".{PACKAGE}.{target}"
                assert target in MESSAGES  # resolvable
        # nested enums land in their owner with full value domains
        for ename, owner in _ENUM_OWNER.items():
            if owner == mname:
                assert enums[ename] == [(v, i) for i, v in enumerate(ENUMS[ename])]


def test_enum_value_names_unique_per_scope():
    """proto rejects duplicate enum value names in one scope; nesting each
    enum in its owner message must leave every scope collision-free."""
    by_owner: dict[str, list[str]] = {}
    for ename, owner in _ENUM_OWNER.items():
        by_owner.setdefault(owner, []).extend(ENUMS[ename])
    for owner, names in by_owner.items():
        assert len(names) == len(set(names)), owner
    assert set(_ENUM_OWNER) == {k for k in ENUMS}


def test_backend_selection(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROTO_DECODE", "python")
    assert decode_backend(spark) == "python"
    monkeypatch.setenv("SPARK_GRAFT_PROTO_DECODE", "jvm")
    assert decode_backend(spark) == "jvm"
    monkeypatch.setenv("SPARK_GRAFT_PROTO_DECODE", "auto")
    assert decode_backend(spark) == ("jvm" if jvm_available(spark) else "python")
    # a typo'd pin must fail loudly, not silently fall back to auto-probing
    monkeypatch.setenv("SPARK_GRAFT_PROTO_DECODE", "JVM")
    with pytest.raises(ValueError):
        decode_backend(spark)


def test_jvm_decode_matches_python_codec(spark):
    """End-to-end parity of the from_protobuf path against the pandas-UDF
    codec on identical fixture batches. Runs only where the spark-protobuf
    classes are on the classpath (a real deployment's --packages)."""
    if not jvm_available(spark):
        pytest.skip("spark-protobuf classes not on the session classpath")
    import pandas as pd
    from pyspark.sql import functions as F

    from consensource_sds_spark.codec.descriptor import container_entries_col, state_changes_col
    from consensource_sds_spark.codec.spark_udfs import decode_container, decode_state_changes
    from consensource_sds_spark.sources import fixtures as fx

    changes = [
        fx.state_change("organization", "orgX", [fx.make_certifying_body()]),
        fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"data": [fx.state_delta_event(changes)["data"]]})
    )
    py = df.select(F.explode(decode_state_changes()(F.col("data"))).alias("c")).collect()
    jvm = df.select(F.explode(state_changes_col(F.col("data"))).alias("c")).collect()
    assert py == jvm

    org_val = fx.state_change("organization", "orgX", [fx.make_certifying_body()])["value"]
    vdf = spark.createDataFrame(pd.DataFrame({"value": [org_val]}))
    py_o = vdf.select(F.explode(decode_container("organization")(F.col("value"))).alias("e")).collect()
    jvm_o = vdf.select(F.explode(container_entries_col("organization", F.col("value"))).alias("e")).collect()
    assert py_o == jvm_o

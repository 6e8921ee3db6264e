"""A1-A8 archive semantics. Sanitation asserts mirror the reference's own
tests (/root/reference/tests/test_extractors.py:349-392)."""

import json

from extract_text_spark.corpus import explode_archives, oracle_extract
from extract_text_spark.extractors.archive import (
    child_doc_id,
    is_system_file,
    sanitize_archive_filename,
)


def test_sanitize_reference_cases():
    assert sanitize_archive_filename("../../../etc/passwd") == "etc/passwd"
    assert sanitize_archive_filename("..\\..\\windows\\system32") == "windows/system32"
    assert sanitize_archive_filename("/absolute/path/file.txt") == "absolute/path/file.txt"
    assert sanitize_archive_filename("folder/file.txt") == "folder/file.txt"
    assert sanitize_archive_filename("simple.txt") == "simple.txt"
    assert sanitize_archive_filename("") == ""
    assert sanitize_archive_filename("./") == ""


def test_system_file_markers():
    assert is_system_file("__MACOSX/x.txt")
    assert is_system_file("a/.DS_Store")
    assert is_system_file("THUMBS.DB")
    assert not is_system_file("normal/file.txt")


def test_child_doc_id_path_convention():
    assert child_doc_id("arch.zip", "a/b.txt") == "arch.zip/a/b.txt"


def _member(path, kind, text, is_archive=False, members=None):
    return {"path": path, "kind": kind, "text": text, "media_ref": None,
            "is_archive": is_archive, "members": members}


def _archive_doc(doc_id, members):
    return {"doc_id": doc_id, "spans": [
        {"kind": "archive_member", "text": json.dumps(m), "media_ref": None,
         "offset": i} for i, m in enumerate(members)
    ]}


def test_explode_fanout_and_filters():
    doc = _archive_doc("z", [
        _member("a.txt", "plain", "hello there"),
        _member("__MACOSX/sys.txt", "plain", "junk"),
        _member("../x.txt", "plain", "escaped"),
    ])
    out = explode_archives([doc])
    ids = sorted(d["doc_id"] for d in out)
    assert ids == ["z/a.txt", "z/x.txt"]


def test_nesting_bound_three_levels():
    lvl3 = [_member("deep.txt", "plain", "bottom")]
    lvl2 = [_member("mid.zip", "archive", None, True, json.dumps(lvl3))]
    lvl1 = [_member("top.zip", "archive", None, True, json.dumps(lvl2))]
    doc = _archive_doc("root.zip", lvl1)
    res = oracle_extract([doc])
    # depth: root.zip -> top.zip -> mid.zip -> deep.txt = 3 explode rounds
    assert "root.zip/top.zip/mid.zip/deep.txt" in res
    status, spans = res["root.zip/top.zip/mid.zip/deep.txt"]
    assert status == "ok" and spans[0]["text"] == "bottom"


def test_nesting_beyond_cap_dropped():
    lvl4 = [_member("too-deep.txt", "plain", "below the cap")]
    lvl3 = [_member("l3.zip", "archive", None, True, json.dumps(lvl4))]
    lvl2 = [_member("l2.zip", "archive", None, True, json.dumps(lvl3))]
    lvl1 = [_member("l1.zip", "archive", None, True, json.dumps(lvl2))]
    res = oracle_extract([_archive_doc("r.zip", lvl1)])
    assert not any("too-deep" in k for k in res)


def test_bomb_guard_rejects_oversized():
    big = _member("big.txt", "plain", "x" * (101 * 1024 * 1024))
    res = oracle_extract([_archive_doc("bomb.zip", [big])])
    assert res["bomb.zip"][0] == "error: Archive content too large"
    assert not any(k != "bomb.zip" for k in res)

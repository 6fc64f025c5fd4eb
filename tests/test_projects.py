"""Projects/storage layer CRUD round-trip mirroring the reference shapes
(core/storage.py:15-35, core/project.py:14-32, utils/projects.py:10-41).
Pure driver-side — no Spark session needed."""

from __future__ import annotations

import json

from fairy_core_spark.plans import projects as prj


def test_new_project_reference_shape(monkeypatch):
    monkeypatch.setenv("FAIRY_FIXED_TIMESTAMP", "1970-01-01T00:00:00Z")
    p = prj.new_project("Liver study", "bulk RNA-seq", project_id="prj_1")
    # exact field set from reference core/project.py:16-32
    assert set(p) == {
        "id", "title", "description", "status", "created_at", "updated_at",
        "type", "tags", "data_inventory", "permissions", "deid", "metadata",
        "repository", "exports",
    }
    assert p["status"] == "In Progress" and p["type"] == "RNA-seq"
    assert p["permissions"] == {"contains_human_data": None, "irb_required": None, "notes": ""}
    assert p["metadata"] == {"project": {}, "samples": []}
    assert p["created_at"] == p["updated_at"] == "1970-01-01T00:00:00Z"


def test_registry_crud_roundtrip(tmp_path):
    store = prj.ProjectStore(tmp_path / ".fairy_data")
    assert store.load_projects() == []  # missing registry -> empty list

    a = store.add_project(prj.new_project("A", "first", project_id="prj_a"))
    store.add_project(prj.new_project("B", "second", project_id="prj_b"))
    assert [p["id"] for p in store.load_projects()] == ["prj_a", "prj_b"]
    # registry file is the reference's projects.json layout
    raw = json.loads((tmp_path / ".fairy_data" / "projects.json").read_text())
    assert isinstance(raw, list) and raw[0]["id"] == "prj_a"

    got = store.get_project("prj_a")
    assert got == a
    assert store.get_project("nope") is None

    upd = store.update_project("prj_a", status="Complete")
    assert upd["status"] == "Complete"
    assert store.get_project("prj_a")["status"] == "Complete"

    # duplicate id rejected
    try:
        store.add_project(prj.new_project("dup", "x", project_id="prj_a"))
        raise AssertionError("duplicate id must raise")
    except ValueError:
        pass

    assert store.delete_project("prj_b") is True
    assert store.delete_project("prj_b") is False
    assert [p["id"] for p in store.load_projects()] == ["prj_a"]


def test_project_dirs_and_manifest(tmp_path):
    store = prj.ProjectStore(tmp_path / ".fairy_data")
    d = store.project_dir("prj_x")
    assert (d / "files").is_dir()  # files/ auto-created (utils/projects.py:13-15)
    assert store.exports_dir("prj_x").is_dir()

    m = store.load_manifest("prj_x")  # default manifest when none saved
    assert m["project_id"] == "prj_x" and m["files"] == []
    m["files"].append({"name": "counts.csv", "bytes": 42})
    store.save_manifest("prj_x", m)
    again = store.load_manifest("prj_x")
    assert again["files"] == [{"name": "counts.csv", "bytes": 42}]
    assert store.load_manifests(["prj_x"])["prj_x"] == again

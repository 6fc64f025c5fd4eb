"""Desktop-workflow projects/storage layer (reference ``core/storage.py:15-35``,
``core/project.py:14-32``, ``utils/projects.py:10-41``): a ``.fairy_data/``
directory holding a ``projects.json`` registry plus per-project folders
(``projects/<id>/files``, ``exports``, ``manifest.json``).

This is driver-side surface only — nothing here touches Spark. It exists so
a user of the reference's project workflow can switch engines without
losing the registry shapes; cluster jobs address data by table/path, not by
project folder.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
from pathlib import Path
from typing import Any

APP_DIRNAME = ".fairy_data"
PROJECTS_BASENAME = "projects.json"


def now_iso() -> str:
    """ISO-8601 UTC with trailing Z (reference storage.py:30-31); honors the
    FAIRY_FIXED_TIMESTAMP override used across the repo's writers."""
    fixed = os.environ.get("FAIRY_FIXED_TIMESTAMP")
    if fixed:
        return fixed
    return _dt.datetime.now(_dt.timezone.utc).isoformat().replace("+00:00", "Z")


def new_project(title: str, description: str, project_id: str | None = None) -> dict[str, Any]:
    """Fresh project record with the reference's field shapes
    (core/project.py:14-32). ``project_id`` defaults to the reference's
    ``prj_<epoch-seconds>`` scheme; pass one explicitly for deterministic
    tests or collision-free bulk creation."""
    now = now_iso()
    return {
        "id": project_id or f"prj_{int(time.time())}",
        "title": title,
        "description": description,
        "status": "In Progress",
        "created_at": now,
        "updated_at": now,
        "type": "RNA-seq",
        "tags": [],
        "data_inventory": [],
        "permissions": {"contains_human_data": None, "irb_required": None, "notes": ""},
        "deid": {"strategy": "", "notes": ""},
        "metadata": {"project": {}, "samples": []},
        "repository": {"choice": None, "notes": ""},
        "exports": [],
    }


def update_project_timestamp(p: dict[str, Any]) -> None:
    p["updated_at"] = now_iso()


class ProjectStore:
    """Registry + per-project folder layout under one data dir.

    Combines the reference's ``Storage`` (projects.json registry,
    storage.py:15-28) and ``utils/projects`` (per-project dirs + manifests,
    projects.py:10-41) behind one root so tests and callers never touch a
    process-global CWD-relative path.
    """

    def __init__(self, data_dir: str | Path | None = None):
        self.data_dir = Path(data_dir) if data_dir else Path(APP_DIRNAME)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.projects_json = self.data_dir / PROJECTS_BASENAME

    # ---- registry (storage.py semantics)

    def load_projects(self) -> list[dict[str, Any]]:
        if self.projects_json.exists():
            return json.loads(self.projects_json.read_text(encoding="utf-8"))
        return []

    def save_projects(self, projects: list[dict[str, Any]]) -> None:
        self.projects_json.write_text(json.dumps(projects, indent=2), encoding="utf-8")

    # ---- registry CRUD conveniences

    def add_project(self, project: dict[str, Any]) -> dict[str, Any]:
        projects = self.load_projects()
        if any(p["id"] == project["id"] for p in projects):
            raise ValueError(f"project id already exists: {project['id']}")
        projects.append(project)
        self.save_projects(projects)
        return project

    def get_project(self, project_id: str) -> dict[str, Any] | None:
        for p in self.load_projects():
            if p["id"] == project_id:
                return p
        return None

    def update_project(self, project_id: str, **fields: Any) -> dict[str, Any]:
        projects = self.load_projects()
        for p in projects:
            if p["id"] == project_id:
                p.update(fields)
                update_project_timestamp(p)
                self.save_projects(projects)
                return p
        raise KeyError(f"no such project: {project_id}")

    def delete_project(self, project_id: str) -> bool:
        projects = self.load_projects()
        kept = [p for p in projects if p["id"] != project_id]
        if len(kept) == len(projects):
            return False
        self.save_projects(kept)
        return True

    # ---- per-project folders (utils/projects.py semantics)

    def project_dir(self, project_id: str) -> Path:
        p = self.data_dir / "projects" / project_id
        (p / "files").mkdir(parents=True, exist_ok=True)
        return p

    def exports_dir(self, project_id: str) -> Path:
        d = self.project_dir(project_id) / "exports"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def manifest_path(self, project_id: str) -> Path:
        return self.project_dir(project_id) / "manifest.json"

    def load_manifest(self, project_id: str) -> dict[str, Any]:
        mp = self.manifest_path(project_id)
        if mp.exists():
            return json.loads(mp.read_text(encoding="utf-8"))
        return {"project_id": project_id, "created_at": time.time(), "files": []}

    def save_manifest(self, project_id: str, manifest: dict[str, Any]) -> None:
        self.manifest_path(project_id).write_text(
            json.dumps(manifest, indent=2), encoding="utf-8"
        )

    def load_manifests(self, project_ids: list[str]) -> dict[str, dict[str, Any]]:
        return {pid: self.load_manifest(pid) for pid in project_ids}

"""Scope catalog — the metadata layer of the engine.

A *scope* is a database (reference scope/scope.h:33-47): a catalog of
vertex types, edge types, storages, indexes, procedures and locks.
Here it is a directory under the engine's base dir:

    <base>/<scope>/catalog.json          # the model
    <base>/<scope>/contexts/<name>/      # parquet data per context
    <base>/<scope>/procs/<module>.py     # python procedures
    <base>/<scope>/locks/<name>.lock     # advisory file locks

Vertex/edge type descriptors follow model/types.h:43-99: typed props
with pk / inc / stamp flags; edges add origin/destin role props.
Storage engine parity is intentionally NOT reproduced — Parquet with
time-bucket partitioning replaces pages, sorters, and indexes
(SURVEY.md §1.5, §4).
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Optional

from pyspark.sql import types as T

# nowdb value type → Spark type (types/types.h:89-99; SURVEY §1.5)
NOWDB_TO_SPARK = {
    "text": T.StringType(),
    "longtext": T.StringType(),
    "date": T.LongType(),    # i64 ns since epoch
    "time": T.LongType(),    # i64 ns since epoch
    "float": T.DoubleType(),
    "int": T.LongType(),
    "uint": T.LongType(),    # >2^63-1 rejected on ingest (SURVEY §7)
    "bool": T.BooleanType(),
}

TIME_TYPES = {"date", "time"}


@dataclass
class Prop:
    name: str
    type: str                       # nowdb type name
    pk: bool = False
    inc: bool = False
    stamp: bool = False
    role: Optional[str] = None      # 'origin' | 'destin' (edges)


@dataclass
class TypeDef:
    name: str
    kind: str                       # 'vertex' | 'edge'
    props: list                     # [Prop]
    storage: Optional[str] = None

    @property
    def pk(self) -> Optional[str]:
        for p in self.props:
            if p.pk:
                return p.name
        return None

    @property
    def stamp_prop(self) -> Optional[str]:
        for p in self.props:
            if p.stamp:
                return p.name
        return None

    def prop_types(self) -> dict[str, str]:
        return {p.name: p.type for p in self.props}

    def spark_schema(self) -> T.StructType:
        return T.StructType([
            T.StructField(p.name, NOWDB_TO_SPARK[p.type],
                          nullable=not p.pk)
            for p in self.props
        ])


@dataclass
class IndexDef:
    name: str
    target: str
    fields: list


@dataclass
class ProcDef:
    module: Optional[str]
    name: str
    language: str
    args: list


@dataclass
class ScopeMeta:
    types: dict = field(default_factory=dict)     # name -> TypeDef
    storages: dict = field(default_factory=dict)  # name -> options
    indexes: dict = field(default_factory=dict)   # name -> IndexDef
    procs: dict = field(default_factory=dict)     # name -> ProcDef
    locks: list = field(default_factory=list)
    views: dict = field(default_factory=dict)     # name -> select SQL


class CatalogError(ValueError):
    pass


class Scope:
    def __init__(self, base: Path, name: str):
        self.name = name
        self.path = Path(base) / name
        self.meta = ScopeMeta()
        # external parquet tables mounted read-only into the scope
        self.mounts: dict[str, str] = {}

    # --- persistence ----------------------------------------------
    @property
    def _catalog_file(self) -> Path:
        return self.path / "catalog.json"

    def save(self) -> None:
        doc = {
            "types": {k: asdict(v) for k, v in self.meta.types.items()},
            "storages": self.meta.storages,
            "indexes": {k: asdict(v) for k, v in self.meta.indexes.items()},
            "procs": {k: asdict(v) for k, v in self.meta.procs.items()},
            "locks": self.meta.locks,
            "views": self.meta.views,
            "mounts": self.mounts,
        }
        self.path.mkdir(parents=True, exist_ok=True)
        self._catalog_file.write_text(json.dumps(doc, indent=1))

    @classmethod
    def load(cls, base: Path, name: str) -> "Scope":
        sc = cls(base, name)
        f = sc._catalog_file
        if f.exists():
            doc = json.loads(f.read_text())
            sc.meta.types = {
                k: TypeDef(v["name"], v["kind"],
                           [Prop(**p) for p in v["props"]], v.get("storage"))
                for k, v in doc.get("types", {}).items()
            }
            sc.meta.storages = doc.get("storages", {})
            sc.meta.indexes = {
                k: IndexDef(**v) for k, v in doc.get("indexes", {}).items()}
            sc.meta.procs = {
                k: ProcDef(**v) for k, v in doc.get("procs", {}).items()}
            sc.meta.locks = doc.get("locks", [])
            sc.meta.views = doc.get("views", {})
            sc.mounts = doc.get("mounts", {})
        return sc

    # --- model ops -------------------------------------------------
    def add_type(self, tdef: TypeDef, if_not_exists: bool = False) -> bool:
        if tdef.name in self.meta.types:
            if if_not_exists:
                return False
            raise CatalogError(f"type {tdef.name!r} already exists")
        self.meta.types[tdef.name] = tdef
        self.save()
        return True

    def drop_type(self, name: str, if_exists: bool = False) -> bool:
        if name not in self.meta.types:
            if if_exists:
                return False
            raise CatalogError(f"no such type {name!r}")
        del self.meta.types[name]
        shutil.rmtree(self.context_dir(name), ignore_errors=True)
        self.save()
        return True

    def get_type(self, name: str) -> TypeDef:
        try:
            return self.meta.types[name]
        except KeyError:
            raise CatalogError(f"no such context {name!r}") from None

    def context_dir(self, name: str) -> Path:
        return self.path / "contexts" / name

    def mount(self, name: str, path: str,
              types: Optional[dict] = None, fmt: str = "parquet",
              options: Optional[dict] = None) -> None:
        """Register an external table as a context. `fmt` is any Spark
        batch source (parquet/csv/json/orc); schema is taken from the
        files (csv/json benefit from explicit `options`, e.g.
        {'header': 'true', 'inferSchema': 'true'}). `types` overrides
        the inferred nowdb types per column (e.g. {'ts': 'time'} so
        time-literal coercion applies to an ns-Long stamp column)."""
        self.mounts[name] = {"path": path, "types": types or {},
                             "format": fmt, "options": options or {}}
        self.save()

    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

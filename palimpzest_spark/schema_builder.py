"""SchemaBuilder — file → StructType (ref ``schemabuilder/schema_builder.py``).

The reference dynamically builds pydantic schemas from csv / json / jsonld /
yml descriptors (``schema_builder.py:21-56`` dispatch). Here the product is a
Spark ``StructType`` whose fields carry the description in StructField
metadata (key ``pz.description``) — the engine's schema algebra
(``palimpzest_spark.schemas``) composes over it unchanged.

Format semantics mirrored:
- **csv**  (ref :97-128): column names from the header; numeric dtypes map to
  ``double``/``long``, everything else ``string``.
- **json** (ref :175-199): ``{"attribute": {"description": ...}, ...}`` or the
  normalized ``{"name", "fields": [{name, description, type?}]}`` dict.
- **jsonld** (ref :130-172): fields from ``@graph`` nodes of ``@type``
  ``rdfs:Class``; ``rdfs:comment`` becomes the description and
  ``schema:rangeIncludes`` ids are appended as the valid-value list. (The
  reference compacts through pyld; absent here, files already in compact
  form — the common schema.org layout — parse identically.)
- **yml**  (ref :201-230): ``schema: {name, description, fields: [...]}``.

``include_attributes`` / ``exclude_attributes`` filter case-insensitively
(ref :84-92).
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import types as T

DESCRIPTION_KEY = "pz.description"

_TYPE_MAP = {
    "string": T.StringType(),
    "str": T.StringType(),
    "text": T.StringType(),
    "numericfield": T.DoubleType(),
    "numeric": T.DoubleType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "long": T.LongType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


def _field(name: str, description: str = "", dtype: T.DataType | None = None) -> T.StructField:
    meta = {DESCRIPTION_KEY: description} if description else {}
    return T.StructField(name, dtype or T.StringType(), True, metadata=meta)


def _num_kind(values: list[str]) -> T.DataType | None:
    """Numeric sniff over non-empty sample values: all-int → long,
    all-float → double, else None (string)."""
    seen = [v for v in values if v not in ("", None)]
    if not seen:
        return None
    is_int = is_float = True
    for v in seen:
        try:
            int(v)
        except ValueError:
            is_int = False
            try:
                float(v)
            except ValueError:
                is_float = False
                break
    if is_int:
        return T.LongType()
    return T.DoubleType() if is_float else None


def from_csv(path: str, sample_rows: int = 1000) -> dict:
    """Header → field names; values sniffed numeric/string (ref :97-128)."""
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, [])
        cols: list[list[str]] = [[] for _ in header]
        for i, row in enumerate(reader):
            if i >= sample_rows:
                break
            for j, v in enumerate(row[: len(header)]):
                cols[j].append(v)
    fields = [
        {"name": name, "description": "", "type": _num_kind(vals) or T.StringType()}
        for name, vals in zip(header, cols)
    ]
    return {"name": "", "description": "", "fields": fields}


def from_json(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "fields" in data:  # already normalized
        return {"name": data.get("name", ""), "description": data.get("description", ""),
                "fields": list(data["fields"])}
    fields = [
        {"name": k, "description": (v or {}).get("description", "")}
        for k, v in data.items()
        if not k.startswith("@")
    ]
    return {"name": "", "description": "", "fields": fields}


def from_jsonld(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    graph = data.get("@graph", [])
    fields = []
    for node in graph:
        if node.get("@type") != "rdfs:Class":
            continue
        name = node.get("rdfs:label")
        if not name:
            continue
        desc = node.get("rdfs:comment", "")
        rng = node.get("schema:rangeIncludes")
        if rng:
            if isinstance(rng, dict):
                rng = [rng]
            values = [v.get("@id", "").split(":")[-1] for v in rng]
            desc += " The only valid values are: " + ", ".join(values)
        fields.append({"name": name, "description": desc})
    return {"name": "", "description": "", "fields": fields}


def from_yml(path: str) -> dict:
    import yaml  # available in this image; gate kept import-local

    with open(path) as f:
        data = yaml.safe_load(f)
    schema = data.get("schema", data) or {}
    return {
        "name": schema.get("name", "") or "",
        "description": schema.get("description", "") or "",
        "fields": list(schema.get("fields", []) or []),
    }


def schema_from_file(
    path: str,
    include_attributes: list[str] | None = None,
    exclude_attributes: list[str] | None = None,
) -> T.StructType:
    """Dispatch on extension (ref :44-55) → StructType with descriptions in
    field metadata. Unknown declared types fall back to string (the
    reference types dynamic fields as ``Any``)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        data = from_csv(path)
    elif ext == ".json":
        data = from_json(path)
    elif ext == ".jsonld":
        data = from_jsonld(path)
    elif ext in (".yml", ".yaml"):
        data = from_yml(path)
    else:
        raise ValueError(f"Unsupported file format: {ext!r}")

    inc = {a.lower() for a in (include_attributes or [])}
    exc = {a.lower() for a in (exclude_attributes or [])}
    fields = []
    for f in data["fields"]:
        name = f["name"]
        norm = name.lower()
        if inc and norm not in inc:
            continue
        if norm in exc:
            continue
        declared = f.get("type")
        if isinstance(declared, T.DataType):
            dtype = declared
        else:
            dtype = _TYPE_MAP.get(str(declared or "").lower(), T.StringType())
        fields.append(_field(name, f.get("description", "") or "", dtype))
    return T.StructType(fields)

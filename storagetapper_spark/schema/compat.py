"""Schema-compatibility classification between observed schema versions.

Extends the S4 evolution surface (reference: schema/alter_schema.go
captures ALTERs; schema/mysql_avro_schema_converter.go emits the Avro
the downstream registry gates on): given (old, new) Spark schemas,
classify each inferred change and the pair overall with
schema-registry semantics:

- BACKWARD  — a reader of the NEW schema can read OLD data
  (safe: add nullable column, widen a type, drop anything)
- FORWARD   — a reader of the OLD schema can read NEW data
  (safe: drop a nullable column, narrow a type, add anything)
- FULL      — both directions hold
- BREAKING  — neither holds (e.g. add non-nullable, incompatible
  retype)

Pure driver-side metadata logic — schemas are tiny; nothing here
touches data.  The verdicts drive the pipeline gate: FULL deploys
freely, BACKWARD requires draining old readers first, FORWARD requires
upgrading writers last, BREAKING requires a new feed version.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# transitions a reader can absorb losslessly (writer type -> reader type)
_WIDENINGS: set[tuple[str, str]] = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("integer", "double"), ("long", "double"),
    ("date", "timestamp"),
}


def _widens(old: T.DataType, new: T.DataType) -> bool:
    return (old.typeName(), new.typeName()) in _WIDENINGS


@dataclass
class CompatFinding:
    column: str
    change: str            # added | dropped | retyped
    verdict: str           # backward | forward | full | breaking
    reason: str


@dataclass
class CompatReport:
    level: str             # FULL | BACKWARD | FORWARD | BREAKING | NONE
    findings: list[CompatFinding] = field(default_factory=list)

    @property
    def backward(self) -> bool:
        return self.level in ("FULL", "BACKWARD")

    @property
    def forward(self) -> bool:
        return self.level in ("FULL", "FORWARD")


def classify(old: T.StructType, new: T.StructType) -> CompatReport:
    """Classify the old→new transition.  NONE means no changes."""
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    findings: list[CompatFinding] = []

    for name, f in old_f.items():
        if name not in new_f:
            # new reader never asks for it → backward-safe; an old
            # reader of new data resolves it only if it was nullable
            if f.nullable:
                findings.append(CompatFinding(
                    name, "dropped", "full",
                    "nullable column: new readers ignore it, old readers "
                    "null-fill"))
            else:
                findings.append(CompatFinding(
                    name, "dropped", "backward",
                    "non-nullable column: old readers cannot null-fill "
                    "new data"))

    for name, f in new_f.items():
        if name not in old_f:
            # old reader never asks for it → forward-safe; a new reader
            # of old data resolves it only if it can default to null
            if f.nullable:
                findings.append(CompatFinding(
                    name, "added", "full",
                    "nullable column: new readers null-fill old data, "
                    "old readers ignore it"))
            else:
                findings.append(CompatFinding(
                    name, "added", "forward",
                    "non-nullable column: new readers cannot null-fill "
                    "old data"))
        elif old_f[name].dataType != f.dataType:
            o, n = old_f[name].dataType, f.dataType
            if _widens(o, n):
                findings.append(CompatFinding(
                    name, "retyped", "backward",
                    f"widening {o.typeName()}→{n.typeName()}: new readers "
                    "absorb old values; old readers may overflow"))
            elif _widens(n, o):
                findings.append(CompatFinding(
                    name, "retyped", "forward",
                    f"narrowing {o.typeName()}→{n.typeName()}: old readers "
                    "absorb new values; new readers may overflow old data"))
            else:
                findings.append(CompatFinding(
                    name, "retyped", "breaking",
                    f"incompatible retype {o.typeName()}→{n.typeName()}"))

    if not findings:
        return CompatReport("NONE", [])
    backward = all(f.verdict in ("full", "backward") for f in findings)
    forward = all(f.verdict in ("full", "forward") for f in findings)
    level = ("FULL" if backward and forward
             else "BACKWARD" if backward
             else "FORWARD" if forward
             else "BREAKING")
    return CompatReport(level, findings)

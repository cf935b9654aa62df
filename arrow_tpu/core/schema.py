"""Field/Schema — mirrors Arrow's ``type.h`` Field/Schema at low resolution."""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Iterable, Optional, Tuple

from . import datatype as dt

__all__ = ["Field", "Schema", "field", "schema"]


@dataclass(frozen=True)
class Field:
    name: str
    type: dt.DataType
    nullable: bool = True

    def __str__(self) -> str:
        return f"{self.name}: {self.type}{'' if self.nullable else ' not null'}"


@dataclass(frozen=True)
class Schema:
    fields: Tuple[Field, ...]

    @property
    def names(self) -> Tuple[str, ...]:
        return tuple(f.name for f in self.fields)

    @property
    def types(self) -> Tuple[dt.DataType, ...]:
        return tuple(f.type for f in self.fields)

    def __len__(self) -> int:
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def field(self, key) -> Field:
        if isinstance(key, int):
            return self.fields[key]
        for f in self.fields:
            if f.name == key:
                return f
        raise KeyError(key)

    def get_field_index(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        return -1

    def append(self, f: Field) -> "Schema":
        return Schema(self.fields + (f,))

    def select(self, names: Iterable[str]) -> "Schema":
        return Schema(tuple(self.field(n) for n in names))

    def equals(self, other: "Schema") -> bool:
        return self.fields == other.fields

    def __str__(self) -> str:
        return "\n".join(str(f) for f in self.fields)

    def to_pyarrow(self):
        import pyarrow as pa
        return pa.schema([
            pa.field(f.name, dt.to_pyarrow_type(f.type), f.nullable)
            for f in self.fields])

    @staticmethod
    def from_pyarrow(pa_schema) -> "Schema":
        return Schema(tuple(
            Field(f.name, dt.from_pyarrow_type(f.type), f.nullable)
            for f in pa_schema))


def field(name: str, type: dt.DataType, nullable: bool = True) -> Field:
    return Field(name, type, nullable)


def schema(fields) -> Schema:
    out = []
    for f in fields:
        if isinstance(f, Field):
            out.append(f)
        else:
            name, type_ = f[0], f[1]
            nullable = f[2] if len(f) > 2 else True
            out.append(Field(name, type_, nullable))
    return Schema(tuple(out))

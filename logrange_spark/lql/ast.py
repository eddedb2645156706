"""LQL abstract syntax tree.

Node shapes mirror the reference grammar (reference: pkg/lql/parser.go:91-198)
but are plain Python dataclasses. The compiler (logrange_spark.compiler)
turns these into PySpark Column expressions / DataFrame pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Identifier:
    """Operand, optionally wrapped in nestable 1-arg functions UPPER/LOWER.

    ``funcs`` is outermost-first: UPPER(LOWER(x)) -> funcs=("UPPER","LOWER").
    """

    operand: str
    funcs: tuple[str, ...] = ()


@dataclass(frozen=True)
class Condition:
    ident: Identifier
    op: str  # <,>,<=,>=,=,!=,CONTAINS,PREFIX,SUFFIX,LIKE
    value: str


@dataclass(frozen=True)
class Not:
    child: "Expr"


@dataclass(frozen=True)
class And:
    children: tuple["Expr", ...]


@dataclass(frozen=True)
class Or:
    children: tuple["Expr", ...]


Expr = Condition | Not | And | Or


@dataclass(frozen=True)
class Source:
    """FROM clause: either a literal tag set (subset match) or an expression."""

    tags: dict[str, str] | None = None
    expr: Expr | None = None


@dataclass(frozen=True)
class TimeRange:
    """RANGE clause, folded to [min_ns, max_ns] epoch nanoseconds."""

    min_ns: int | None = None
    max_ns: int | None = None


@dataclass(frozen=True)
class Position:
    pos_id: str  # "head" | "tail" | serialized cursor token


@dataclass(frozen=True)
class Select:
    format: str | None = None
    source: Source | None = None
    range: TimeRange | None = None
    where: Expr | None = None
    position: Position | None = None
    offset: int | None = None
    limit: int | None = None


@dataclass(frozen=True)
class ShowPartitions:
    source: Source | None = None
    offset: int | None = None
    limit: int | None = None


@dataclass(frozen=True)
class ShowPipes:
    offset: int | None = None
    limit: int | None = None


@dataclass(frozen=True)
class DescribePartition:
    tags: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class DescribePipe:
    name: str = ""


@dataclass(frozen=True)
class CreatePipe:
    name: str
    source: Source | None = None
    where: Expr | None = None


@dataclass(frozen=True)
class DeletePipe:
    name: str


@dataclass(frozen=True)
class Truncate:
    dry_run: bool = False
    source: Source | None = None
    min_size: int | None = None
    max_size: int | None = None
    before_ns: int | None = None
    max_db_size: int | None = None


Statement = (
    Select
    | ShowPartitions
    | ShowPipes
    | DescribePartition
    | DescribePipe
    | CreatePipe
    | DeletePipe
    | Truncate
)

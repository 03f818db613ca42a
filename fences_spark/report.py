"""Driver-side confusion-matrix reporting — the analog of the
reference's ``ConfusionMatrix`` accuracy metrics and ASCII/LaTeX table
renderers (fences/core/util.py:10-47, 86-153).

The *counting* is distributed (``ValidationResult.confusion`` is one
map-side-combined aggregate — the ``__iadd__`` partial+final merge of
core/util.py:132-137 expressed as groupBy-sum); this module only
formats the four resulting counters, so it is pure driver-side
presentation with no Spark dependency.
"""

from __future__ import annotations

from dataclasses import dataclass

# a table row is a list of cells; None renders a horizontal rule —
# the reference's Table convention (core/util.py:7, usage :95-103)
Table = list[list[str] | None]


@dataclass(frozen=True)
class ConfusionCounts:
    valid_accepted: int
    valid_rejected: int
    invalid_accepted: int
    invalid_rejected: int

    @classmethod
    def from_row(cls, row) -> "ConfusionCounts":
        """Build from the one-row DataFrame of
        ``ValidationResult.confusion`` (or any mapping with the four
        count fields)."""
        return cls(
            int(row["valid_accepted"]),
            int(row["valid_rejected"]),
            int(row["invalid_accepted"]),
            int(row["invalid_rejected"]),
        )

    def __add__(self, other: "ConfusionCounts") -> "ConfusionCounts":
        return ConfusionCounts(
            self.valid_accepted + other.valid_accepted,
            self.valid_rejected + other.valid_rejected,
            self.invalid_accepted + other.invalid_accepted,
            self.invalid_rejected + other.invalid_rejected,
        )

    def total(self) -> int:
        return (self.valid_accepted + self.valid_rejected
                + self.invalid_accepted + self.invalid_rejected)

    def accuracy(self) -> float:
        """(core/util.py:142-146) — 0 on an empty matrix."""
        total = self.total()
        if total == 0:
            return 0.0
        return (self.valid_accepted + self.invalid_rejected) / total

    def balanced_accuracy(self) -> float:
        """(core/util.py:148-153) — 0 when either class is empty."""
        valid_total = self.valid_accepted + self.valid_rejected
        invalid_total = self.invalid_accepted + self.invalid_rejected
        if valid_total == 0 or invalid_total == 0:
            return 0.0
        return ((self.valid_accepted / valid_total)
                + (self.invalid_rejected / invalid_total)) / 2

    def is_diagonal(self) -> bool:
        """True iff every valid row was accepted and every invalid row
        rejected — the reference test suite's pass criterion
        (test/json_schema/test_generate.py:26-36)."""
        return self.valid_rejected == 0 and self.invalid_accepted == 0

    def to_table(self) -> Table:
        """Accepted/Rejected × Valid/Invalid layout with margins
        (core/util.py:94-103)."""
        va, vr = self.valid_accepted, self.valid_rejected
        ia, ir = self.invalid_accepted, self.invalid_rejected
        return [
            ["", "Valid", "Invalid", "Total"],
            None,
            ["Accepted", str(va), str(ia), str(va + ia)],
            ["Rejected", str(vr), str(ir), str(vr + ir)],
            None,
            ["Total", str(va + vr), str(ia + ir), str(self.total())],
        ]


def render_table(table: Table) -> list[str]:
    """Column-aligned ASCII lines; a None row becomes a rule of dashes
    spanning the table width (core/util.py:10-41)."""
    col_delim, rule_char = " | ", "-"
    value_rows = [row for row in table if row]
    if not value_rows:
        return [rule_char * len(table)]
    num_cols = max(len(row) for row in value_rows)
    widths = [0] * num_cols
    for row in value_rows:
        for idx, cell in enumerate(row):
            widths[idx] = max(widths[idx], len(cell))
    total_width = sum(widths) + len(col_delim) * (num_cols - 1)
    lines: list[str] = []
    for row in table:
        if row:
            lines.append(col_delim.join(
                cell.ljust(widths[idx]) for idx, cell in enumerate(row)))
        else:
            lines.append(rule_char * total_width)
    return lines


def render_latex(table: Table) -> list[str]:
    """tabular environment with \\hline for rule rows — the
    print_latex_table analog (core/util.py:54-83)."""
    value_rows = [row for row in table if row]
    num_cols = max(len(row) for row in value_rows) if value_rows else 0
    lines = ["\\begin{tabular}{" + "l" * num_cols + "}"]
    for row in table:
        if row:
            lines.append(" & ".join(row) + " \\\\")
        else:
            lines.append("\\hline")
    lines.append("\\end{tabular}")
    return lines

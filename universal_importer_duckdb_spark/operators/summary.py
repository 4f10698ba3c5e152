"""Run summary (reference ``generate_summary`` main.py:348-365 and
``get_projection_summary`` main.py:328-346)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RunSummary:
    entity: str
    total_records: int = 0
    valid_records: int = 0
    schema_errors: int = 0
    custom_validation_errors: int = 0
    duplicates_removed: int = 0
    projection_counts: dict[str, int] = field(default_factory=dict)

    def report(self) -> str:
        lines = [
            f"Summary for entity '{self.entity}':",
            f"  Total records processed: {self.total_records}",
            f"  Valid records: {self.valid_records}",
            f"  Schema validation errors: {self.schema_errors}",
            f"  Custom validation errors: {self.custom_validation_errors}",
            f"  Duplicates removed: {self.duplicates_removed}",
        ]
        for name, n in self.projection_counts.items():
            lines.append(f"  Projection '{name}': {n} records")
        return "\n".join(lines)

from .convert import FieldSpec, convert_typed, split_conversion_errors
from .apply import (
    BatchRaced,
    CdcApplier,
    MaintenancePolicy,
    create_pages_table,
    read_pages,
    seed_pages,
)
from .generate import ChangeGenConfig, changes_df, gen_changes, gen_pages, pages_df
from .follow import ChangelogFollower, ResyncRequired
from .views import IncrementalRollup
from .oracle import oracle_apply, oracle_quarantine, validity_reason
from .replay import ReplayReport, replay

__all__ = [
    "BatchRaced",
    "CdcApplier",
    "MaintenancePolicy",
    "ChangelogFollower",
    "IncrementalRollup",
    "ResyncRequired",
    "FieldSpec",
    "convert_typed",
    "split_conversion_errors",
    "create_pages_table",
    "seed_pages",
    "read_pages",
    "ChangeGenConfig",
    "gen_pages",
    "gen_changes",
    "pages_df",
    "changes_df",
    "oracle_apply",
    "oracle_quarantine",
    "validity_reason",
    "replay",
    "ReplayReport",
]

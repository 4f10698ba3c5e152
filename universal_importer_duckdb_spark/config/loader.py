"""YAML pipeline-config loading + structural validation.

Same config grammar as the reference (reference config.yaml:1-84;
loader semantics at reference main.py:10-33): a top-level
``transformations_config`` mapping of entity name → {source, settings,
projections, validations}. ``validate_config`` reproduces the
reference's checks (KeyError on missing entity / source / settings /
validations / duplicate_resolution / custom_validation_mode) so the
ported unit tests pass unchanged.
"""

from __future__ import annotations

from typing import Any

import yaml

VALID_DUP_RESOLUTIONS = ("first", "last", "exclude_all")
VALID_VALIDATION_MODES = ("stop", "skip")


def load_config(config_path: str) -> dict[str, Any]:
    """Load the YAML config file (reference main.py:10-13)."""
    with open(config_path) as f:
        return yaml.safe_load(f)


def validate_config(config: dict[str, Any], entity: str) -> dict[str, Any]:
    """Structural validation of one entity's config (reference main.py:15-33).

    Raises KeyError with the same granularity as the reference: missing
    transformations_config, missing entity, missing source/settings/
    validations, and missing settings sub-keys.
    """
    if "transformations_config" not in config:
        raise KeyError("Missing 'transformations_config' in config")
    entities = config["transformations_config"]
    if entity not in entities:
        raise KeyError(f"Entity '{entity}' not found in config")
    details = entities[entity]
    if "source" not in details:
        raise KeyError(f"Missing 'source' for entity '{entity}'")
    if "settings" not in details:
        raise KeyError(f"Missing 'settings' for entity '{entity}'")
    if "validations" not in details:
        raise KeyError(f"Missing 'validations' for entity '{entity}'")
    settings = details["settings"]
    if "duplicate_resolution" not in settings:
        raise KeyError(f"Missing 'duplicate_resolution' in settings for '{entity}'")
    if "custom_validation_mode" not in settings:
        raise KeyError(f"Missing 'custom_validation_mode' in settings for '{entity}'")
    if settings["duplicate_resolution"] not in VALID_DUP_RESOLUTIONS:
        raise ValueError(
            f"duplicate_resolution must be one of {VALID_DUP_RESOLUTIONS}"
        )
    if settings["custom_validation_mode"] not in VALID_VALIDATION_MODES:
        raise ValueError(
            f"custom_validation_mode must be one of {VALID_VALIDATION_MODES}"
        )
    return details

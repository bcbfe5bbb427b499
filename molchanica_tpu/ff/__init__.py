"""Force-field front end: Amber parameter file parsing, typing, assignment.

The TPU-native analog of the reference's `dynamics::params` surface
(FfParamSet, merge_params, assign_missing_params, find_ff_types — SURVEY.md
§2.1 "Parameter / preparation API").
"""
from .params import FfParamSet, ForceFieldParams, merge_params  # noqa: F401
from .amber_dat import parse_dat, parse_frcmod  # noqa: F401

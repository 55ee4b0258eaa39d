"""North-star training-data-pipeline operators (SURVEY.md §2.3) — filled in
incrementally; see operators/ for the implementations."""

from __future__ import annotations

"""Converter-pipeline queries (span trees → ChatCompletion records) —
the genuinely non-SQL-expressible document ops (pandas-UDF XML extraction,
validators, tool-call pairing) exercised end-to-end under the driver's
rows-only check. Populated as the document-ops layer lands."""

from __future__ import annotations

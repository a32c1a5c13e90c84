"""Query-side operators over materialized graph tables and driver tables."""

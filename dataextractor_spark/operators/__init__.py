"""Operator library: each module registers queries with the registry.

Modules map to SURVEY.md §2 rows:
- relational    — scans, filters, projections, the flagship aggregate
- joins         — equi/broadcast/semi/anti/theta/as-of/self-join pairs
- aggregates    — distinct, rollup/cube, percentiles, 2-D binning
- windows       — ranking/analytic window functions, top-k
- scalars       — string/date/math/array/map/JSON scalar functions
- etl_parity    — Tier-A reference parity (flatten, unpivot, normalize)
- windows_time  — event-time tumbling/sliding/session windows (batch
                  form of the streaming operators)
- dedup         — exact + near-duplicate detection (Tier C)
- similarity    — vector top-k / ANN (Tier C)
- text          — language-ID, quality, tokens, fingerprints (Tier C)
"""

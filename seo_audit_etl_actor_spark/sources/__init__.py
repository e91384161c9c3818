"""Ingestion sources: encoding-sniffing CSV reader (SURVEY §2.1 S5 / §7.3
H1), ZIP + nested-ZIP entry scans (S1-S4), Lighthouse JSON extraction (S6),
and the job-input contract (S9)."""

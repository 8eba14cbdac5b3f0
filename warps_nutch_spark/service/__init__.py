"""REST admin service — the NutchMaster analog.

Reference: ``service/NutchMaster.java`` (embedded REST server wiring
Job/Admin/Config/Db/Seed resources over a job-worker pool), re-expressed
as an in-process HTTP server delegating every data-plane operation to
the Spark engine (RoundDriver stages, frontier store scans).
"""

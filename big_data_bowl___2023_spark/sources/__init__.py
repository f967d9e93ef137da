from .io import load_table, read_csv_glob, write_parquet
from .lease import (
    WriterLeaseConflict,
    acquire_writer_lease,
    break_writer_lease,
    commit_gate,
    held_lease_token,
    release_writer_lease,
    renew_writer_lease,
    writer_lease,
    writer_lease_status,
)
from . import schemas

__all__ = ["load_table", "read_csv_glob", "write_parquet", "schemas",
           "writer_lease", "acquire_writer_lease",
           "release_writer_lease", "break_writer_lease",
           "renew_writer_lease", "writer_lease_status",
           "commit_gate", "held_lease_token",
           "WriterLeaseConflict"]

"""End-to-end query plans mirroring the reference's entry points."""

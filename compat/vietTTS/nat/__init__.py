"""Shim of the reference's ``vietTTS.nat`` subpackage."""

"""ALF / CC-ALF APS payload parsing (HLSyntaxReader::parseAlfAps,
HLSyntaxReader.cpp:905; alfFilterCoeffs :~960)."""

from __future__ import annotations


def parse_alf_aps(r, aps) -> None:
    raise NotImplementedError("ALF APS parsing lands with the ALF filter")

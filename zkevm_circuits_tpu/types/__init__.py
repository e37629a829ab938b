"""Core Ethereum types — the eth-types layer (SURVEY.md §2.1 item 1)."""

from .evm import GasCost, OpcodeId  # noqa: F401
from .bytecode import Bytecode  # noqa: F401

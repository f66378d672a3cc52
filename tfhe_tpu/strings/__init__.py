from .ascii import FheAsciiString, StringClientKey, StringServerKey  # noqa: F401

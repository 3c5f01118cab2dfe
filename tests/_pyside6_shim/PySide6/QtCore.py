"""QDataStream/QFile/QIODevice shim — big-endian Qt_5_6 semantics (test-only)."""

from __future__ import annotations

import enum
import struct

from .QtGui import QVector3D


class QIODevice:
    class OpenModeFlag(enum.IntEnum):
        ReadOnly = 1


class QFile:
    def __init__(self, path: str):
        self._path = path
        self._data = b""
        self._open = False

    def open(self, mode) -> bool:
        try:
            with open(self._path, "rb") as f:
                self._data = f.read()
            self._open = True
            return True
        except OSError:
            return False

    def close(self) -> None:
        self._open = False


class QDataStream:
    class Version(enum.IntEnum):
        Qt_5_6 = 17

    def __init__(self, device: QFile):
        self._data = device._data
        self._pos = 0

    def setVersion(self, _version) -> None:
        pass

    def _take(self, n: int) -> bytes:
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        return out

    def readDouble(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    def readFloat(self) -> float:
        # QDataStream defaults to DoublePrecision: floats stream as 8 bytes
        return struct.unpack(">d", self._take(8))[0]

    def readInt32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def readQString(self) -> str:
        n = struct.unpack(">I", self._take(4))[0]
        if n == 0xFFFFFFFF:
            return ""
        return self._take(n).decode("utf-16-be")

    def __rshift__(self, v):
        if isinstance(v, QVector3D):
            v.setX(self.readFloat())
            v.setY(self.readFloat())
            v.setZ(self.readFloat())
            return self
        raise TypeError(type(v))

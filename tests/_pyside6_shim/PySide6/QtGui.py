"""float32-semantics QVector3D/QVector4D/QMatrix4x4/QQuaternion (test shim)."""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32
FUZZ = 1e-5  # qFuzzyIsNull(float)


def _f32(x) -> np.float32:
    return F32(x)


class QVector3D:
    __slots__ = ("_v",)

    def __init__(self, *args):
        if len(args) == 0:
            self._v = np.zeros(3, dtype=F32)
        elif len(args) == 1:
            a = args[0]
            if isinstance(a, QVector3D):
                self._v = a._v.copy()
            else:  # tuple/list
                self._v = np.array([a[0], a[1], a[2]], dtype=F32)
        else:
            self._v = np.array([args[0], args[1], args[2]], dtype=F32)

    def x(self) -> float:
        return float(self._v[0])

    def y(self) -> float:
        return float(self._v[1])

    def z(self) -> float:
        return float(self._v[2])

    def setX(self, v) -> None:
        self._v[0] = _f32(v)

    def setY(self, v) -> None:
        self._v[1] = _f32(v)

    def setZ(self, v) -> None:
        self._v[2] = _f32(v)

    def __add__(self, other: "QVector3D") -> "QVector3D":
        r = QVector3D()
        r._v = self._v + other._v
        return r

    def __sub__(self, other: "QVector3D") -> "QVector3D":
        r = QVector3D()
        r._v = self._v - other._v
        return r

    def __mul__(self, other) -> "QVector3D":
        r = QVector3D()
        if isinstance(other, QVector3D):
            r._v = self._v * other._v
        else:
            r._v = self._v * _f32(other)
        return r

    __rmul__ = __mul__

    def __imul__(self, scalar) -> "QVector3D":
        self._v = self._v * _f32(scalar)
        return self

    def __truediv__(self, scalar) -> "QVector3D":
        r = QVector3D()
        r._v = self._v / _f32(scalar)
        return r

    def __neg__(self) -> "QVector3D":
        r = QVector3D()
        r._v = -self._v
        return r

    @staticmethod
    def dotProduct(a: "QVector3D", b: "QVector3D") -> float:
        v = (a._v[0] * b._v[0] + a._v[1] * b._v[1]) + a._v[2] * b._v[2]
        return float(v)

    @staticmethod
    def crossProduct(a: "QVector3D", b: "QVector3D") -> "QVector3D":
        r = QVector3D()
        av, bv = a._v, b._v
        r._v = np.array(
            [
                av[1] * bv[2] - av[2] * bv[1],
                av[2] * bv[0] - av[0] * bv[2],
                av[0] * bv[1] - av[1] * bv[0],
            ],
            dtype=F32,
        )
        return r

    def lengthSquared(self) -> float:
        v = (self._v[0] * self._v[0] + self._v[1] * self._v[1]) + self._v[2] * self._v[2]
        return float(v)

    def length(self) -> float:
        v64 = self._v.astype(np.float64)
        return float(F32(math.sqrt(v64[0] ** 2 + v64[1] ** 2 + v64[2] ** 2)))

    def normalized(self) -> "QVector3D":
        ln = F32(self.length())
        if abs(float(ln) - 1.0) <= FUZZ:
            return QVector3D(self)
        if abs(float(ln)) <= FUZZ:
            return QVector3D()
        return self / ln

    def normalize(self) -> None:
        self._v = self.normalized()._v

    def toTuple(self):
        return (self.x(), self.y(), self.z())

    def __repr__(self):
        return f"QVector3D({self.x()}, {self.y()}, {self.z()})"


class QVector4D:
    __slots__ = ("_v",)

    def __init__(self, *args):
        if len(args) == 0:
            self._v = np.zeros(4, dtype=F32)
        elif len(args) == 1 and isinstance(args[0], QVector4D):
            self._v = args[0]._v.copy()
        elif len(args) == 2 and isinstance(args[0], QVector3D):
            self._v = np.array([*args[0]._v, args[1]], dtype=F32)
        else:
            self._v = np.array(args, dtype=F32)

    def x(self) -> float:
        return float(self._v[0])

    def y(self) -> float:
        return float(self._v[1])

    def z(self) -> float:
        return float(self._v[2])

    def w(self) -> float:
        return float(self._v[3])

    def toVector3D(self) -> QVector3D:
        r = QVector3D()
        r._v = self._v[:3].copy()
        return r


class QMatrix4x4:
    """Row-major float32 4x4 (Qt stores column-major internally; semantics
    here are expressed row-major with identical results)."""

    __slots__ = ("_m",)

    def __init__(self, *args):
        if args and isinstance(args[0], QMatrix4x4):
            self._m = args[0]._m.copy()
        else:
            self._m = np.eye(4, dtype=F32)

    def setToIdentity(self) -> None:
        self._m = np.eye(4, dtype=F32)

    def perspective(self, vertical_angle: float, aspect: float, near: float, far: float) -> None:
        if near == far or aspect == 0:
            return
        radians = math.radians(vertical_angle / 2.0)
        sine = math.sin(radians)
        if sine == 0:
            return
        cotan = math.cos(radians) / sine
        clip = far - near
        m = np.zeros((4, 4), dtype=np.float64)
        m[0, 0] = cotan / aspect
        m[1, 1] = cotan
        m[2, 2] = -(near + far) / clip
        m[2, 3] = -(2.0 * near * far) / clip
        m[3, 2] = -1.0
        self._m = (self._m.astype(np.float64) @ m).astype(F32)

    def lookAt(self, eye: QVector3D, center: QVector3D, up: QVector3D) -> None:
        eye64 = eye._v.astype(np.float64)
        center64 = center._v.astype(np.float64)
        up64 = up._v.astype(np.float64)
        forward = center64 - eye64
        forward = forward / math.sqrt(float((forward**2).sum()))
        side = np.cross(forward, up64)
        side = side / math.sqrt(float((side**2).sum()))
        upv = np.cross(side, forward)
        m = np.eye(4, dtype=np.float64)
        m[0, :3] = side
        m[1, :3] = upv
        m[2, :3] = -forward
        m[0, 3] = -side @ eye64
        m[1, 3] = -upv @ eye64
        m[2, 3] = forward @ eye64
        self._m = (self._m.astype(np.float64) @ m).astype(F32)

    def __mul__(self, other: "QMatrix4x4") -> "QMatrix4x4":
        r = QMatrix4x4()
        r._m = (self._m.astype(np.float64) @ other._m.astype(np.float64)).astype(F32)
        return r

    def inverted(self):
        m64 = self._m.astype(np.float64)
        det = np.linalg.det(m64)
        if det == 0.0:
            return QMatrix4x4(), False
        r = QMatrix4x4()
        r._m = np.linalg.inv(m64).astype(F32)
        return r, True

    def map(self, v):
        if isinstance(v, QVector4D):
            m = self._m
            out = QVector4D()
            res = np.empty(4, dtype=F32)
            for r in range(4):
                res[r] = ((m[r, 0] * v._v[0] + m[r, 1] * v._v[1]) + m[r, 2] * v._v[2]) + m[
                    r, 3
                ] * v._v[3]
            out._v = res
            return out
        # QVector3D: implicit w=1, perspective divide
        m = self._m
        res = np.empty(4, dtype=F32)
        for r in range(4):
            res[r] = ((m[r, 0] * v._v[0] + m[r, 1] * v._v[1]) + m[r, 2] * v._v[2]) + m[r, 3]
        out = QVector3D()
        w = res[3]
        if float(w) == 1.0:
            out._v = res[:3].copy()
        else:
            out._v = (res[:3] / w).astype(F32)
        return out


class QQuaternion:
    """float32 quaternion (scalar, x, y, z)."""

    __slots__ = ("_q",)

    def __init__(self, *args):
        if len(args) == 0:
            self._q = np.array([1, 0, 0, 0], dtype=F32)
        elif len(args) == 2 and isinstance(args[1], QVector3D):
            self._q = np.array([args[0], *args[1]._v], dtype=F32)
        elif len(args) == 4:
            self._q = np.array(args, dtype=F32)
        elif len(args) == 1 and isinstance(args[0], QQuaternion):
            self._q = args[0]._q.copy()
        else:
            raise TypeError(args)

    def scalar(self) -> float:
        return float(self._q[0])

    def vector(self) -> QVector3D:
        r = QVector3D()
        r._v = self._q[1:].copy()
        return r

    def conjugated(self) -> "QQuaternion":
        return QQuaternion(
            float(self._q[0]), float(-self._q[1]), float(-self._q[2]), float(-self._q[3])
        )

    def __mul__(self, other: "QQuaternion") -> "QQuaternion":
        w1, x1, y1, z1 = self._q
        w2, x2, y2, z2 = other._q
        return QQuaternion(
            float(w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2),
            float(w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2),
            float(w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2),
            float(w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2),
        )

    def __truediv__(self, scalar) -> "QQuaternion":
        q = QQuaternion(self)
        q._q = (self._q / _f32(scalar)).astype(F32)
        return q

    def normalized(self) -> "QQuaternion":
        q64 = self._q.astype(np.float64)
        len_sq = float((q64**2).sum())
        if abs(len_sq - 1.0) <= FUZZ:
            return QQuaternion(self)
        if abs(len_sq) <= FUZZ:
            return QQuaternion(0.0, 0.0, 0.0, 0.0)
        q = QQuaternion(self)
        q._q = (q64 / math.sqrt(len_sq)).astype(F32)
        return q

    def rotatedVector(self, v: QVector3D) -> QVector3D:
        vq = QQuaternion(0.0, float(v._v[0]), float(v._v[1]), float(v._v[2]))
        return (self * vq * self.conjugated()).vector()

    @staticmethod
    def fromAxisAndAngle(axis: QVector3D, angle: float) -> "QQuaternion":
        x, y, z = (float(axis._v[i]) for i in range(3))
        length = float(F32(math.sqrt(np.float64(axis._v[0]) ** 2 + np.float64(axis._v[1]) ** 2
                                     + np.float64(axis._v[2]) ** 2)))
        if abs(length - 1.0) > FUZZ and abs(length) > FUZZ:
            x = float(F32(x) / F32(length))
            y = float(F32(y) / F32(length))
            z = float(F32(z) / F32(length))
        a = float(F32(math.radians(float(F32(angle) / F32(2.0)))))
        s = float(F32(math.sin(a)))
        c = float(F32(math.cos(a)))
        return QQuaternion(c, float(F32(x) * F32(s)), float(F32(y) * F32(s)),
                           float(F32(z) * F32(s))).normalized()

    @staticmethod
    def rotationTo(v_from: QVector3D, v_to: QVector3D) -> "QQuaternion":
        v0 = v_from.normalized()
        v1 = v_to.normalized()
        d = float(F32(QVector3D.dotProduct(v0, v1)) + F32(1.0))
        if abs(d) <= FUZZ:
            axis = QVector3D.crossProduct(QVector3D(1, 0, 0), v0)
            if abs(axis.lengthSquared()) <= FUZZ:
                axis = QVector3D.crossProduct(QVector3D(0, 1, 0), v0)
            axis.normalize()
            return QQuaternion(0.0, axis)
        d = float(F32(math.sqrt(float(F32(2.0) * F32(d)))))
        axis = QVector3D.crossProduct(v0, v1) / d
        return QQuaternion(float(F32(d) * F32(0.5)), axis).normalized()

"""A strict, hand-written PySide6 behavioral stub for exercising
gui_qt.qt_classes() on hosts without Qt (reference crt_filter.py's GUI
is its primary surface, :1272-2349; PySide6 has been absent on this rig
all five rounds, so CRTWindow had never been CONSTRUCTED anywhere).

Design rules (what makes this a validator, not a mock):

- Every class implements ONLY methods/attributes that exist in real
  PySide6 with compatible signatures. There is no ``__getattr__``
  catch-all anywhere: a dead-reckoned Qt call in gui_qt.py (misspelled
  method, wrong module, wrong argument count) raises AttributeError /
  TypeError here exactly where real Qt would fail at runtime.
- Behaviors that gui_qt.py RELIES on are modeled for real:
  signals connect/emit with PySide6's argument-truncation for Python
  slots, ``blockSignals`` suppresses emission, spinboxes clamp to their
  range and only emit on actual change, QDoubleSpinBox rounds to its
  ``decimals`` (default 2 — real Qt quantizes setValue), QDialog
  accept/reject drive exec()'s return value, QThread.start() runs its
  ``started`` slots (synchronously — deterministic for tests), and
  QImage validates the source buffer is large enough for
  (bytesPerLine, height) at copy() time.
- State that must not leak between tests lives in module objects built
  fresh per call: use ``make_modules()`` and install the result into
  sys.modules around each test (see tests/test_gui_qt_stubbed.py).

This cannot prove pixel-level Qt rendering correctness — the offscreen
smoke in test_gui_logic.py still runs wherever real PySide6 exists —
but it executes every line of the window/dialog/worker construction
and interaction logic that was previously dead on this host.
"""

from __future__ import annotations

import inspect
import sys
import types


# --------------------------------------------------------------------------
# signal plumbing


def _max_positional(fn, n):
    """How many of n positional args this callable can take (PySide6
    truncates signal args to the slot's arity for Python callables)."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return n
    count = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            count += 1
        elif p.kind == p.VAR_POSITIONAL:
            return n
    return min(n, count)


class _BoundSignal:
    def __init__(self, owner):
        self._owner = owner
        self._handlers = []

    def connect(self, fn):
        if not callable(fn):
            raise TypeError("connect() argument must be callable")
        self._handlers.append(fn)

    def disconnect(self, fn=None):
        if fn is None:
            self._handlers.clear()
        else:
            self._handlers.remove(fn)

    def emit(self, *args):
        if getattr(self._owner, "_signals_blocked", False):
            return
        for fn in list(self._handlers):
            fn(*args[: _max_positional(fn, len(args))])


def make_modules():
    """Build fresh PySide6/QtCore/QtGui/QtWidgets module objects (no
    shared state with any previous build)."""

    class Signal:
        """Class-attribute descriptor -> per-instance _BoundSignal."""

        def __init__(self, *types_):
            self._types = types_
            self._name = "_signal_anon"

        def __set_name__(self, owner, name):
            self._name = "_signal_" + name

        def __get__(self, obj, owner=None):
            if obj is None:
                return self
            store = obj.__dict__.setdefault("_bound_signals", {})
            if self._name not in store:
                store[self._name] = _BoundSignal(obj)
            return store[self._name]

    def Slot(*_args, **_kwargs):
        def deco(fn):
            return fn

        return deco

    # ---------------- QtCore ----------------

    class QObject:
        def __init__(self, parent=None):
            self._parent = parent
            self._signals_blocked = False

        def parent(self):
            return self._parent

        def setParent(self, parent):
            self._parent = parent

        def blockSignals(self, block):
            prev = self._signals_blocked
            self._signals_blocked = bool(block)
            return prev

        def signalsBlocked(self):
            return self._signals_blocked

        def moveToThread(self, thread):
            pass

        def deleteLater(self):
            pass

    class QThread(QObject):
        started = Signal()
        finished = Signal()

        def __init__(self, parent=None):
            super().__init__(parent)
            self._running = False

        def start(self):
            # synchronous for determinism: the worker-object pattern's
            # started-slot runs to completion inside start()
            self._running = True
            self.started.emit()

        def quit(self):
            self._running = False
            self.finished.emit()

        def wait(self, deadline=None):
            return True

        def isRunning(self):
            return self._running

    class QTimer(QObject):
        timeout = Signal()

        def __init__(self, parent=None):
            super().__init__(parent)
            self._active = False
            self._interval = 0

        def start(self, msec=None):
            if msec is not None:
                self._interval = int(msec)
            self._active = True

        def stop(self):
            self._active = False

        def isActive(self):
            return self._active

        def interval(self):
            return self._interval

        def setInterval(self, msec):
            self._interval = int(msec)

    class Qt:
        # real enum values (Qt.AlignmentFlag / Qt.GlobalColor)
        AlignLeft = 0x0001
        AlignHCenter = 0x0004
        AlignVCenter = 0x0080
        AlignCenter = 0x0084
        transparent = 19

    class QMetaObject:
        @staticmethod
        def invokeMethod(*args, **kwargs):
            raise NotImplementedError(
                "queued invokeMethod is not modeled by the stub")

    # ---------------- QtGui ----------------

    class QAction(QObject):
        triggered = Signal(bool)

        def __init__(self, text="", parent=None):
            if not isinstance(text, str):  # QAction(parent) overload
                text, parent = "", text
            super().__init__(parent)
            self._text = text

        def setText(self, text):
            self._text = str(text)

        def text(self):
            return self._text

        def trigger(self):
            self.triggered.emit(False)

    class QImage:
        Format_RGB888 = 13
        Format_RGBA8888 = 17

        def __init__(self, *args):
            # overloads used here: (buffer, w, h, bytesPerLine, format)
            # and the internal copy constructor via _from_bytes
            if len(args) == 5:
                data, w, h, bpl, fmt = args
                mv = memoryview(data)
                if bpl < 3 * w:
                    raise ValueError(
                        f"bytesPerLine {bpl} < 3*width {3 * w}")
                if mv.nbytes < bpl * h:
                    raise ValueError(
                        f"buffer {mv.nbytes} B too small for "
                        f"{bpl}x{h} image")
                self._mv, self._w, self._h, self._bpl = mv, w, h, bpl
                self._fmt, self._bytes = fmt, None
            else:
                raise TypeError(
                    f"QImage ctor overload not modeled: {len(args)} args")

        def copy(self):
            out = object.__new__(QImage)
            # reads the source buffer NOW — a freed/shrunk buffer fails
            out._bytes = bytes(self._mv[: self._bpl * self._h])
            out._mv = memoryview(out._bytes)
            out._w, out._h = self._w, self._h
            out._bpl, out._fmt = self._bpl, self._fmt
            return out

        def width(self):
            return self._w

        def height(self):
            return self._h

    class QPixmap:
        def __init__(self, w=0, h=0):
            self._w, self._h = w, h
            self._image = None

        @staticmethod
        def fromImage(img):
            pm = QPixmap(img.width(), img.height())
            pm._image = img
            return pm

        def width(self):
            return self._w

        def height(self):
            return self._h

        def isNull(self):
            return self._w == 0 and self._h == 0

    class QColor:
        def __init__(self, r=0, g=0, b=0, a=255):
            self._rgba = (int(r), int(g), int(b), int(a))

        def getRgb(self):
            return self._rgba

    class QPalette:
        # real QPalette.ColorRole values
        WindowText = 0
        Button = 1
        Text = 6
        ButtonText = 8
        Base = 9
        Window = 10
        Highlight = 12
        HighlightedText = 13
        AlternateBase = 16

        def __init__(self):
            self._colors = {}

        def setColor(self, role, color):
            if not isinstance(color, QColor):
                raise TypeError("setColor expects a QColor")
            self._colors[role] = color

        def color(self, role):
            return self._colors.get(role, QColor())

    class QGuiApplication(QObject):
        _instance = None

        def __init__(self, argv=None):
            super().__init__()
            type(self)._instance = self
            QGuiApplication._instance = self

        @staticmethod
        def instance():
            return QGuiApplication._instance

    # ---------------- QtWidgets ----------------

    class QWidget(QObject):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._layout = None
            self._enabled = True
            self._visible = False
            self._window_title = ""
            self._actions = []

        def setLayout(self, layout):
            self._layout = layout
            layout._parent_widget = self

        def layout(self):
            return self._layout

        def setEnabled(self, b):
            self._enabled = bool(b)

        def isEnabled(self):
            return self._enabled

        def setVisible(self, b):
            self._visible = bool(b)

        def isVisible(self):
            return self._visible

        def show(self):
            self._visible = True

        def hide(self):
            self._visible = False

        def resize(self, w, h):
            self._size = (int(w), int(h))

        def setFixedWidth(self, w):
            self._fixed_width = int(w)

        def setMinimumSize(self, w, h):
            self._min_size = (int(w), int(h))

        def setMaximumWidth(self, w):
            self._max_width = int(w)

        def setWindowTitle(self, t):
            self._window_title = str(t)

        def windowTitle(self):
            return self._window_title

        def addAction(self, action):
            self._actions.append(action)

        def actions(self):
            return list(self._actions)

        def closeEvent(self, event):
            event.accept()

        def close(self):
            ev = QCloseEvent()
            self.closeEvent(ev)
            if ev.isAccepted():
                self._visible = False
                return True
            return False

    class QCloseEvent:
        def __init__(self):
            self._accepted = True

        def accept(self):
            self._accepted = True

        def ignore(self):
            self._accepted = False

        def isAccepted(self):
            return self._accepted

    class _QLayout(QObject):
        def __init__(self, parent=None):
            super().__init__()
            self._items = []
            self._parent_widget = None
            if parent is not None:
                parent.setLayout(self)

        def count(self):
            return len(self._items)

    class QHBoxLayout(_QLayout):
        def addWidget(self, w, stretch=0, alignment=None):
            self._items.append(("widget", w, stretch))

        def addLayout(self, l, stretch=0):
            self._items.append(("layout", l, stretch))

    class QVBoxLayout(QHBoxLayout):
        pass

    class QFormLayout(_QLayout):
        def addRow(self, *args):
            if len(args) == 1:
                self._items.append((None, args[0]))
            elif len(args) == 2:
                label, field = args
                self._items.append((str(label), field))
            else:
                raise TypeError("addRow takes 1 or 2 arguments")

        def rowCount(self):
            return len(self._items)

    class QLabel(QWidget):
        def __init__(self, text="", parent=None):
            super().__init__(parent)
            self._text = str(text)
            self._pixmap = None
            self._alignment = 0

        def setText(self, t):
            self._text = str(t)

        def text(self):
            return self._text

        def setAlignment(self, a):
            self._alignment = a

        def setPixmap(self, pm):
            if not isinstance(pm, QPixmap):
                raise TypeError("setPixmap expects a QPixmap")
            self._pixmap = pm

        def pixmap(self):
            return self._pixmap

    class QLineEdit(QWidget):
        textChanged = Signal(str)

        def __init__(self, text="", parent=None):
            super().__init__(parent)
            self._text = str(text)

        def setText(self, t):
            t = str(t)
            if t != self._text:
                self._text = t
                self.textChanged.emit(t)

        def text(self):
            return self._text

    class _SpinBase(QWidget):
        def _init_range(self, lo, hi, value):
            self._min, self._max, self._value = lo, hi, value
            self._step = 1
            self._special = ""

        def _coerce(self, v):
            raise NotImplementedError

        def _emit_changed(self):
            raise NotImplementedError

        def setRange(self, lo, hi):
            self._min, self._max = self._coerce(lo), self._coerce(hi)
            clamped = min(max(self._value, self._min), self._max)
            if clamped != self._value:
                self._value = clamped
                self._emit_changed()

        def setMinimum(self, lo):
            self.setRange(self._coerce(lo), self._max)

        def setMaximum(self, hi):
            self.setRange(self._min, self._coerce(hi))

        def minimum(self):
            return self._min

        def maximum(self):
            return self._max

        def setValue(self, v):
            v = min(max(self._coerce(v), self._min), self._max)
            if v != self._value:
                self._value = v
                self._emit_changed()

        def value(self):
            return self._value

        def setSingleStep(self, s):
            self._step = self._coerce(s)

        def singleStep(self):
            return self._step

        def setSpecialValueText(self, t):
            self._special = str(t)

        def specialValueText(self):
            return self._special

    def _apply_ctor_properties(obj, props):
        for name, val in props.items():
            setter = getattr(obj, "set" + name[0].upper() + name[1:])
            setter(val)

    class QSpinBox(_SpinBase):
        valueChanged = Signal(int)

        def __init__(self, parent=None, **properties):
            super().__init__(parent)
            self._init_range(0, 99, 0)  # real QSpinBox defaults
            _apply_ctor_properties(self, properties)

        def _coerce(self, v):
            return int(v)

        def _emit_changed(self):
            self.valueChanged.emit(self._value)

    class QDoubleSpinBox(_SpinBase):
        valueChanged = Signal(float)

        def __init__(self, parent=None, **properties):
            super().__init__(parent)
            self._decimals = 2  # real default: setValue quantizes
            self._init_range(0.0, 99.99, 0.0)
            _apply_ctor_properties(self, properties)

        def _coerce(self, v):
            return round(float(v), self._decimals)

        def setDecimals(self, d):
            self._decimals = int(d)
            self.setValue(self._value)

        def decimals(self):
            return self._decimals

        def _emit_changed(self):
            self.valueChanged.emit(self._value)

    class QCheckBox(QWidget):
        toggled = Signal(bool)

        def __init__(self, text="", parent=None):
            super().__init__(parent)
            self._text = str(text)
            self._checked = False

        def setChecked(self, b):
            b = bool(b)
            if b != self._checked:
                self._checked = b
                self.toggled.emit(b)

        def isChecked(self):
            return self._checked

        def setText(self, t):
            self._text = str(t)

        def text(self):
            return self._text

    class QPushButton(QWidget):
        clicked = Signal(bool)

        def __init__(self, text="", parent=None):
            super().__init__(parent)
            self._text = str(text)

        def click(self):
            self.clicked.emit(False)

        def text(self):
            return self._text

    class QComboBox(QWidget):
        currentIndexChanged = Signal(int)
        currentTextChanged = Signal(str)

        def __init__(self, parent=None):
            super().__init__(parent)
            self._items = []
            self._index = -1

        def addItem(self, text):
            self._items.append(str(text))
            if self._index < 0:
                self.setCurrentIndex(0)

        def addItems(self, texts):
            for t in texts:
                self.addItem(t)

        def setCurrentIndex(self, i):
            i = int(i)
            if i != self._index and -1 <= i < len(self._items):
                self._index = i
                self.currentIndexChanged.emit(i)
                self.currentTextChanged.emit(self.currentText())

        def currentIndex(self):
            return self._index

        def currentText(self):
            return self._items[self._index] if self._index >= 0 else ""

        def findText(self, text):
            try:
                return self._items.index(str(text))
            except ValueError:
                return -1

        def count(self):
            return len(self._items)

    class QProgressBar(QWidget):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._value = 0
            self._range = (0, 100)

        def setValue(self, v):
            self._value = int(v)

        def value(self):
            return self._value

        def setRange(self, lo, hi):
            self._range = (int(lo), int(hi))

    class QTabWidget(QWidget):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._tabs = []

        def addTab(self, widget, label):
            if not isinstance(widget, QWidget):
                raise TypeError("addTab expects a QWidget")
            self._tabs.append((widget, str(label)))
            return len(self._tabs) - 1

        def count(self):
            return len(self._tabs)

        def tabText(self, i):
            return self._tabs[i][1]

        def widget(self, i):
            return self._tabs[i][0]

    class QStatusBar(QWidget):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._message = ""
            self._messages = []  # full history, for assertions
            self._permanent = []

        def showMessage(self, msg, timeout=0):
            self._message = str(msg)
            self._messages.append(self._message)

        def currentMessage(self):
            return self._message

        def clearMessage(self):
            self._message = ""

        def addPermanentWidget(self, w, stretch=0):
            self._permanent.append(w)

    class QToolBar(QWidget):
        def __init__(self, title="", parent=None):
            super().__init__(parent)
            self._title = str(title)
            self._movable = True

        def setMovable(self, b):
            self._movable = bool(b)

    class QMainWindow(QWidget):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._toolbars = []
            self._central = None
            self._statusbar = None

        def addToolBar(self, title):
            tb = QToolBar(title, self)
            self._toolbars.append(tb)
            return tb

        def setCentralWidget(self, w):
            self._central = w

        def centralWidget(self):
            return self._central

        def statusBar(self):
            if self._statusbar is None:
                self._statusbar = QStatusBar(self)
            return self._statusbar

    class QDialog(QWidget):
        accepted = Signal()
        rejected = Signal()
        finished = Signal(int)
        Accepted = 1
        Rejected = 0

        def __init__(self, parent=None):
            super().__init__(parent)
            self._result = QDialog.Rejected

        def accept(self):
            self.done(QDialog.Accepted)

        def reject(self):
            self.done(QDialog.Rejected)

        def done(self, r):
            self._result = int(r)
            (self.accepted if r == QDialog.Accepted else self.rejected).emit()
            self.finished.emit(self._result)

        def result(self):
            return self._result

        def exec(self):
            # no event loop: returns the current result (tests drive
            # accept()/reject() or monkeypatch exec on the class)
            return self._result

    class QDialogButtonBox(QWidget):
        accepted = Signal()
        rejected = Signal()
        # real StandardButton values
        Ok = 0x00000400
        Cancel = 0x00400000

        def __init__(self, buttons=0, parent=None):
            super().__init__(parent)
            self._buttons = buttons

    class QFileDialog(QWidget):
        @staticmethod
        def getOpenFileName(parent=None, caption="", dir="", filter="",
                            selectedFilter=""):
            return "", ""

        @staticmethod
        def getSaveFileName(parent=None, caption="", dir="", filter="",
                            selectedFilter=""):
            return "", ""

    class QMessageBox(QWidget):
        _critical_calls = []  # (title, text) record for assertions

        @classmethod
        def critical(cls, parent, title, text):
            cls._critical_calls.append((str(title), str(text)))
            return 0

    class QApplication(QGuiApplication):
        def __init__(self, argv=None):
            super().__init__(argv)
            self._style = ""
            self._palette = None
            self._stylesheet = ""

        @staticmethod
        def instance():
            return QGuiApplication._instance

        def setStyle(self, style):
            self._style = str(style)

        def setPalette(self, pal):
            if not isinstance(pal, QPalette):
                raise TypeError("setPalette expects a QPalette")
            self._palette = pal

        def setStyleSheet(self, qss):
            self._stylesheet = str(qss)

        def exec(self):
            return 0

    qtcore = types.ModuleType("PySide6.QtCore")
    for cls in (QObject, QThread, QTimer, Qt, QMetaObject):
        setattr(qtcore, cls.__name__, cls)
    qtcore.Signal = Signal
    qtcore.Slot = Slot

    qtgui = types.ModuleType("PySide6.QtGui")
    for cls in (QAction, QImage, QPixmap, QColor, QPalette,
                QGuiApplication, QCloseEvent):
        setattr(qtgui, cls.__name__, cls)

    qtwidgets = types.ModuleType("PySide6.QtWidgets")
    for cls in (QWidget, QMainWindow, QToolBar, QLabel, QLineEdit,
                QSpinBox, QDoubleSpinBox, QCheckBox, QPushButton,
                QComboBox, QProgressBar, QTabWidget, QStatusBar,
                QHBoxLayout, QVBoxLayout, QFormLayout, QDialog,
                QDialogButtonBox, QFileDialog, QMessageBox,
                QApplication):
        setattr(qtwidgets, cls.__name__, cls)

    pyside6 = types.ModuleType("PySide6")
    pyside6.__path__ = []  # mark as package
    pyside6.QtCore = qtcore
    pyside6.QtGui = qtgui
    pyside6.QtWidgets = qtwidgets
    return pyside6


def install(monkeypatch):
    """Install a fresh stub into sys.modules (monkeypatch-scoped) and
    return the PySide6 module object. Callers must also reset
    gui_qt._QT_CLASSES around use."""
    mod = make_modules()
    monkeypatch.setitem(sys.modules, "PySide6", mod)
    monkeypatch.setitem(sys.modules, "PySide6.QtCore", mod.QtCore)
    monkeypatch.setitem(sys.modules, "PySide6.QtGui", mod.QtGui)
    monkeypatch.setitem(sys.modules, "PySide6.QtWidgets", mod.QtWidgets)
    return mod

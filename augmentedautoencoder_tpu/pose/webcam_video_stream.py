"""Threaded webcam reader (reference auto_pose/test/webcam_video_stream.py):
a daemon thread keeps grabbing frames so consumers always read the latest."""

from __future__ import annotations

import threading
from typing import Optional


class WebcamVideoStream:
    def __init__(self, src: int = 0, width: Optional[int] = None, height: Optional[int] = None):
        import cv2

        self.stream = cv2.VideoCapture(src)
        if width:
            self.stream.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        if height:
            self.stream.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        self.grabbed, self.frame = self.stream.read()
        self.stopped = False
        self._lock = threading.Lock()
        self._thread = None

    def start(self) -> "WebcamVideoStream":
        self._thread = threading.Thread(target=self._update, daemon=True)
        self._thread.start()
        return self

    def _update(self) -> None:
        while not self.stopped:
            grabbed, frame = self.stream.read()
            with self._lock:
                self.grabbed, self.frame = grabbed, frame

    def read(self):
        with self._lock:
            return self.frame

    def stop(self) -> None:
        self.stopped = True
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        self.stream.release()

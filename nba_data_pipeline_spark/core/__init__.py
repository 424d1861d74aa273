from .session import get_session, stop_session  # noqa: F401

"""Index facade — placeholder, filled in as the build progresses."""


class Index:  # pragma: no cover - placeholder
    pass


class CPIndex:  # pragma: no cover - placeholder
    pass

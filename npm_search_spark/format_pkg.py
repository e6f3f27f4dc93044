"""formatPkg-equivalent flattening: registry doc (dynamic JSON) -> strict record.

Re-creates, from scratch and behavior-first, the transform pipeline of the
reference (algolia/npm-search):

  - nice-package normalization    reference src/formatPkg.ts:66 (lib nice-package)
  - formatPkg projection          reference src/formatPkg.ts:63-208
  - truncation                    reference src/formatPkg.ts:210-277
  - HTML-escape pass              reference src/formatPkg.ts:279-287

Golden parity is asserted against the reference's OWN jest snapshot corpus
(tests/fixtures/format_pkg_golden.json, extracted from
src/__tests__/__snapshots__/formatPkg.test.ts.snap).

Spark integration: per BASELINE.json input_hint, no per-row Python UDFs are
allowed in query plans — this module exposes ``format_packages_df`` built on
``mapInPandas`` (Arrow-batched). The per-document logic is necessarily
imperative (open-schema JSON with union types, recursive ``exports`` walks,
size-capped truncation — SURVEY.md §2.10), exactly the case where the
PySpark guide prescribes Arrow-batched ``mapInPandas`` over row UDFs. The
function is pure per-row, so the stage is embarrassingly parallel and scales
with partition count; hot-partition salting happens upstream (frontier.py).
"""

from __future__ import annotations

import hashlib
import json
import re
import urllib.parse
from typing import Any, Iterator

MAX_OBJ_SIZE = 450_000  # reference src/config.ts:166 (maxObjSize)

# ---------------------------------------------------------------------------
# small JS-semantics helpers
# ---------------------------------------------------------------------------


def js_sizeof(obj: Any) -> int:
    """Approximate the object-sizeof npm lib (strings: UTF-16 units x2,
    numbers 8, booleans 4). Used only by the truncation guard."""
    if obj is None:
        return 0
    if isinstance(obj, bool):
        return 4
    if isinstance(obj, (int, float)):
        return 8
    if isinstance(obj, str):
        return len(obj.encode("utf-16-le"))
    if isinstance(obj, dict):
        return sum(js_sizeof(k) + js_sizeof(v) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return sum(js_sizeof(x) for x in obj)
    return 0


def truncate_utf8_bytes(s: str, max_bytes: int) -> str:
    """UTF-8-byte-safe truncation (truncate-utf8-bytes equivalent)."""
    if max_bytes <= 0:
        return ""
    b = s.encode("utf-8")
    if len(b) <= max_bytes:
        return s
    return b[:max_bytes].decode("utf-8", errors="ignore")


_ESCAPE_RE = re.compile(r'["\'&<>]')
_ESCAPE_MAP = {"&": "&amp;", '"': "&quot;", "'": "&#39;", "<": "&lt;", ">": "&gt;"}


def escape_html(s: str) -> str:
    """escape-html npm lib equivalent."""
    return _ESCAPE_RE.sub(lambda m: _ESCAPE_MAP[m.group()], s)


def human_number(n: float) -> str:
    """numeral(n).format('0.[0]a'): 1100 -> '1.1k', 0 -> '0', 11e6 -> '11m'."""
    if n is None:
        return "0"
    neg = n < 0
    n = abs(n)
    for div, suffix in ((1e12, "t"), (1e9, "b"), (1e6, "m"), (1e3, "k")):
        if n >= div:
            v = n / div
            # one optional decimal, trailing .0 dropped (numeral 0.[0]a)
            s = f"{v:.1f}"
            if s.endswith(".0"):
                s = s[:-2]
            return ("-" if neg else "") + s + suffix
    s = f"{n:.1f}"
    if s.endswith(".0"):
        s = s[:-2]
    return ("-" if neg else "") + s


DEFAULT_GRAVATAR = "https://www.gravatar.com/avatar/"


def gravatar_url(email: Any) -> str:
    if not email or not isinstance(email, str) or "@" not in email:
        return DEFAULT_GRAVATAR
    h = hashlib.md5(email.strip().lower().encode("utf-8")).hexdigest()
    return f"https://gravatar.com/avatar/{h}"


def encode_uri_component(s: str) -> str:
    return urllib.parse.quote(str(s), safe="-_.!~*'()")


def js_date_parse_ms(s: Any) -> int | None:
    """Date.parse(ISO string) -> epoch ms; NaN (None here) when unparseable."""
    if not s or not isinstance(s, str):
        return None
    m = re.match(
        r"^(\d{4})-(\d{2})-(\d{2})(?:T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?"
        r"(Z|[+-]\d{2}:?\d{2})?)?$",
        s.strip(),
    )
    if not m:
        return None
    import calendar

    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mm = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    ms = int((m.group(7) or "0").ljust(3, "0"))
    try:
        base = calendar.timegm((y, mo, d, hh, mm, ss, 0, 0, 0)) * 1000 + ms
    except (ValueError, OverflowError):
        return None
    tz = m.group(8)
    if tz and tz not in ("Z",):
        sign = 1 if tz[0] == "+" else -1
        tzh = int(tz[1:3])
        tzm = int(tz.replace(":", "")[3:5])
        base -= sign * (tzh * 60 + tzm) * 60_000
    return base


# ---------------------------------------------------------------------------
# git host URL parsing (hosted-git-info / github-url-to-object equivalents)
# ---------------------------------------------------------------------------

_SHORTCUT_HOSTS = {
    "github": "github.com",
    "gitlab": "gitlab.com",
    "bitbucket": "bitbucket.org",
}
_KNOWN_HOSTS = {"github.com", "gitlab.com", "bitbucket.org"}

_SCP_RE = re.compile(
    r"^git@(github\.com|gitlab\.com|bitbucket\.org):([^/]+)/(.+?)(?:\.git)?(?:#.*)?$"
)
_URL_RE = re.compile(
    r"^(?:git\+)?(?:https?|git|ssh)://(?:[^@/]+@)?(?:www\.)?"
    r"(github\.com|gitlab\.com|bitbucket\.org)[/:]([^/]+)/([^/#]+?)(?:\.git)?/?(?:#.*)?$"
)
_SHORTCUT_RE = re.compile(r"^(github|gitlab|bitbucket):([^/]+)/(.+?)(?:\.git)?(?:#.*)?$")
_BARE_RE = re.compile(r"^([^:/@#\s]+)/([^:/@#\s]+?)(?:\.git)?(?:#.*)?$")


def parse_git_host(url: str) -> dict[str, str] | None:
    """hosted-git-info.fromUrl equivalent for github/gitlab/bitbucket.

    Returns {host, user, project} or None. Reference behavior notes
    (src/formatPkg.ts:488-535): URLs with extra path segments (monorepo
    /tree/... URLs) are NOT parsed here — the http-regex fallback handles
    them and preserves the path.
    """
    if not url or not isinstance(url, str):
        return None
    m = _SHORTCUT_RE.match(url)
    if m:
        return {
            "host": _SHORTCUT_HOSTS[m.group(1)],
            "user": m.group(2),
            "project": m.group(3),
        }
    m = _SCP_RE.match(url)
    if m:
        return {"host": m.group(1), "user": m.group(2), "project": m.group(3)}
    m = _URL_RE.match(url)
    if m:
        return {"host": m.group(1), "user": m.group(2), "project": m.group(3)}
    if "://" not in url and ":" not in url:
        m = _BARE_RE.match(url)
        if m:  # 'user/repo' is a github shortcut in hosted-git-info
            return {"host": "github.com", "user": m.group(1), "project": m.group(2)}
    return None


_HTTP_FALLBACK_RE = re.compile(
    r"^https?://(?:www\.)?((?:github|gitlab|bitbucket)).((?:com|org))/([^/]+)/([^/]+)(/.+)?$"
)


def get_repository_info(repository: Any) -> dict[str, str] | None:
    """Reference getRepositoryInfo (src/formatPkg.ts:488-535)."""
    if not repository:
        return None
    url = repository if isinstance(repository, str) else repository.get("url")
    directory = "" if isinstance(repository, str) else (repository.get("directory") or "")
    if not url:
        return None
    info = parse_git_host(url)
    if info:
        return {
            "url": url,
            "project": info["project"],
            "user": info["user"],
            "host": info["host"],
            "path": re.sub(r"^[./]+", "", directory),
        }
    m = _HTTP_FALLBACK_RE.match(url)
    if not m:
        return None
    domain, tld, user, project, path = m.groups()
    return {
        "url": url,
        "host": f"{domain}.{tld}",
        "user": user,
        "project": project,
        "path": re.sub(r"^[./]+", "", directory) or (path or ""),
    }


_GH_REPO_RE = re.compile(r"^https://(?:www\.)?github.com/([^/]+)/([^/]+)(/.+)?$")

_GH_URL_TO_OBJECT_RE = re.compile(
    r"^(?:git\+)?(?:https?|git|ssh)://(?:[^@/]+@)?(?:www\.)?github\.com/"
    r"([^/]+)/([^/#]+?)(?:\.git)?/?(?:#.*)?$"
)
_GH_SCP_TO_OBJECT_RE = re.compile(r"^git@github\.com:([^/]+)/(.+?)(?:\.git)?(?:#.*)?$")


def github_https_url(url: Any) -> str | None:
    """github-url-to-object(...).https_url equivalent: canonical
    'https://github.com/user/repo' for full github URLs only (bare
    'user/repo' shortcuts are NOT handled — observed nice-package behavior
    in the reference golden corpus: security-held fixture keeps its raw
    'npm/security-holder' string)."""
    if not url or not isinstance(url, str):
        return None
    m = _GH_URL_TO_OBJECT_RE.match(url) or _GH_SCP_TO_OBJECT_RE.match(url)
    if m:
        return f"https://github.com/{m.group(1)}/{m.group(2)}"
    return None


def get_github_repo_info(url: str, git_head: str | None) -> dict[str, Any] | None:
    """Reference getGitHubRepoInfo (src/formatPkg.ts:416-444)."""
    m = _GH_REPO_RE.match(url or "")
    if not m:
        return None
    user, project, path = m.groups()
    return {
        "user": user,
        "project": project,
        "path": path or "",
        "head": git_head if git_head is not None else "master",
    }


# ---------------------------------------------------------------------------
# nice-package normalization (behavior reconstructed from the reference's
# own `nice-package should nice *` golden snapshots)
# ---------------------------------------------------------------------------

# top-level/version keys that nice-package stashes under `other`
_OTHER_KEYS = (
    "_attachments",
    "_from",
    "_id",
    "_nodeVersion",
    "_npmOperationalInternal",
    "_npmUser",
    "_npmVersion",
    "_rev",
    "_shasum",
    "author",
    "bugs",
    "directories",
    "dist",
    "dist-tags",
    "maintainers",
    "readmeFilename",
    "time",
    "users",
)


def normalize_doc(doc: Any) -> dict[str, Any] | None:
    """nice-package equivalent: flatten dist-tags.latest version onto the
    doc, derive created/modified/lastPublisher/owners/starsCount, normalize
    github repositories to canonical https strings, stash registry cruft
    under ``other``."""
    if not isinstance(doc, dict):
        return None
    # doc-wins merge: top-level doc fields shadow the latest version's
    # (observed in the reference's security-held fixture, where the doc's
    # repository overrides the version's — formatPkg.test.ts:891-941)
    latest = (doc.get("dist-tags") or {}).get("latest")
    versions = doc.get("versions") or {}
    if latest and isinstance(versions, dict) and isinstance(versions.get(latest), dict):
        merged = {**versions[latest], **doc}
    else:
        merged = dict(doc)

    time_map = doc.get("time") or {}
    if isinstance(time_map, dict):
        if "created" in time_map:
            merged["created"] = time_map.get("created")
        if "modified" in time_map:
            merged["modified"] = time_map.get("modified")
    if merged.get("_npmUser"):
        merged["lastPublisher"] = merged["_npmUser"]
    if merged.get("maintainers") is not None:
        merged["owners"] = merged["maintainers"]
    if isinstance(doc.get("users"), dict):
        merged["starsCount"] = len(doc["users"])

    repo = merged.get("repository")
    if repo is not None:
        url = repo.get("url") if isinstance(repo, dict) else repo
        https = github_https_url(url)
        if https:
            merged["repository"] = https

    other = {k: merged.pop(k) for k in _OTHER_KEYS if k in merged}
    merged["other"] = other
    return merged


# ---------------------------------------------------------------------------
# formatPkg projection (reference src/formatPkg.ts:63-208)
# ---------------------------------------------------------------------------


def _format_user(user: dict[str, Any]) -> dict[str, Any]:
    return {
        "name": _s(user.get("name")),
        "email": _s(user.get("email")),
        "avatar": gravatar_url(user.get("email")),
        "link": f"https://www.npmjs.com/~{encode_uri_component(user.get('name') or '')}",
    }


def _s(v: Any) -> str | None:
    if v is None:
        return None
    return v if isinstance(v, str) else json.dumps(v)


def _smap(v: Any) -> dict[str, str]:
    if not isinstance(v, dict):
        return {}
    return {str(k): (x if isinstance(x, str) else json.dumps(x)) for k, x in v.items()}


def _get_author(cleaned: dict) -> dict | None:
    author = cleaned["other"].get("author")
    if isinstance(author, dict):
        return _format_user(author)
    owners = cleaned.get("owners")
    if isinstance(owners, list) and owners and isinstance(owners[0], dict):
        return _format_user(owners[0])
    return None


def _get_license(cleaned: dict) -> str | None:
    lic = cleaned.get("license")
    if not lic:
        return None
    if isinstance(lic, dict) and isinstance(lic.get("type"), str):
        return lic["type"]
    if isinstance(lic, str):
        return lic
    return None


def _get_owner(repository, last_publisher, author):
    if repository and repository.get("user"):
        user = repository["user"]
        host = repository.get("host")
        if host == "github.com":
            return {
                "name": user,
                "email": None,
                "avatar": f"https://github.com/{user}.png",
                "link": f"https://github.com/{user}",
            }
        if host == "gitlab.com":
            return {
                "name": user,
                "email": None,
                "avatar": (last_publisher or {}).get("avatar"),
                "link": f"https://gitlab.com/{user}",
            }
        if host == "bitbucket.org":
            return {
                "name": user,
                "email": None,
                "avatar": f"https://bitbucket.org/account/{user}/avatar",
                "link": f"https://bitbucket.org/{user}",
            }
    if last_publisher:
        return last_publisher
    return author or None


def get_versions(cleaned_other_time: Any, raw_versions: Any) -> dict[str, str]:
    """time ∩ keys(versions) (reference src/formatPkg.ts:372-386)."""
    if isinstance(cleaned_other_time, dict):
        real = set((raw_versions or {}).keys())
        return {k: v for k, v in cleaned_other_time.items() if k in real}
    return {}


_SUBSET_VUE_RE = re.compile(r"^(@vue/|vue-|@[\w-]+/vue-)cli-plugin-")


def _get_computed(cleaned: dict) -> tuple[list[str], dict[str, str]]:
    """registrySubsetRules (reference src/formatPkg.ts:33-61)."""
    name = cleaned.get("name") or ""
    keywords = cleaned.get("keywords") or []
    if not isinstance(keywords, list):
        keywords = [keywords]
    schematics = cleaned.get("schematics") or ""
    out: list[str] = []
    meta: dict[str, str] = {}
    if name.startswith("@babel/plugin") or name.startswith("babel-plugin-"):
        out.append("babel-plugin")
    if _SUBSET_VUE_RE.match(name):
        out.append("vue-cli-plugin")
    if name.startswith("generator-") and "yeoman-generator" in keywords:
        out.append("yeoman-generator")
    if isinstance(schematics, str) and len(schematics) > 0:
        out.append("angular-cli-schematic")
        meta["schematics"] = schematics
    if name.startswith("webpack-scaffold-"):
        out.append("webpack-scaffold")
    return out, meta


def _get_keywords(cleaned: dict) -> list[str]:
    kw = cleaned.get("keywords")
    if isinstance(kw, list):
        return [k if isinstance(k, str) else json.dumps(k) for k in kw]
    if isinstance(kw, str):
        return [kw]
    return []


_ALT_STRIP_RE = re.compile(r"[-/@_.]+")
_ALT_SUFFIX_RE = re.compile(r"\.?(js|css)$")


def get_alternative_names(name: str) -> list[str]:
    """Insertion-ordered set, matching JS Set semantics
    (reference src/formatPkg.ts:562-583)."""
    out: list[str] = []

    def add(x: str) -> None:
        if x not in out:
            out.append(x)

    add(_ALT_STRIP_RE.sub("", name))
    add(_ALT_STRIP_RE.sub(" ", name))
    m = _ALT_SUFFIX_RE.search(name)
    if m:
        add(name[: len(name) - len(m.group(0))])
    else:
        add(f"{name}.js")
        add(f"{name}js")
    add(name)
    return out


def get_mains(main: Any) -> list[str]:
    """Reference getMains (src/formatPkg.ts:585-598)."""
    if isinstance(main, list):
        return [m for m in main if isinstance(m, str)]
    if isinstance(main, str):
        return [main]
    if main is None:
        return ["index.js"]
    return []


def get_export_keys(exp: Any) -> list[str]:
    """Recursive exports key walk (reference src/formatPkg.ts:600-609)."""
    if not isinstance(exp, dict):
        return []
    keys = list(exp.keys())
    nested = [k for key in keys for k in get_export_keys(exp[key])]
    return keys + nested


_TYPE_TO_MODULE = {"commonjs": "cjs", "module": "esm"}


def get_module_types(cleaned: dict) -> list[str]:
    out: list[str] = []

    def add(x: str | None) -> None:
        if x and x not in out:
            out.append(x)

    t = cleaned.get("type")
    if t:
        add(_TYPE_TO_MODULE.get(t))
    export_keys = get_export_keys(cleaned.get("exports"))
    if "import" in export_keys:
        add("esm")
    if "require" in export_keys:
        add("cjs")
    if isinstance(cleaned.get("module"), str):
        add("esm")
    for main in get_mains(cleaned.get("main")):
        if main.endswith(".mjs"):
            add("esm")
        if main.endswith(".cjs"):
            add("cjs")
    if not out:
        out.append("unknown")
    return out


def get_style_types(cleaned: dict) -> list[str]:
    style = cleaned.get("style")
    if not isinstance(style, str):
        return []
    ext = style.split(".")[-1]  # JS split('.').pop(): whole string when no dot
    return [ext.lower()] if ext else []


def _get_types(cleaned: dict) -> dict[str, Any]:
    if cleaned.get("types"):
        return {"ts": "included", "definitelyTyped": None}
    if cleaned.get("typings"):
        return {"ts": "included", "definitelyTyped": None}
    return {"ts": "possible", "definitelyTyped": None}


def _get_homepage(cleaned: dict) -> str | None:
    homepage = cleaned.get("homepage")
    repository = cleaned.get("repository")
    if (
        homepage
        and isinstance(homepage, str)
        and (
            not repository
            or not isinstance(repository, str)
            or homepage.find(repository) < 0
        )
    ):
        return homepage
    return None


def _escape_record(obj: Any, key: str | None = None) -> Any:
    """traverse+escape-html on all string leaves except readme
    (reference src/formatPkg.ts:279-287)."""
    if isinstance(obj, str):
        return obj if key == "readme" else escape_html(obj)
    if isinstance(obj, dict):
        return {k: _escape_record(v, k) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_escape_record(v, key) for v in obj]
    return obj


def _truncate_package(pkg: dict[str, Any]) -> dict[str, Any] | None:
    """Size-capped truncation (reference src/formatPkg.ts:210-277)."""
    smaller = dict(pkg)
    diff = js_sizeof(smaller) - MAX_OBJ_SIZE
    if diff > 0 and pkg.get("readme"):
        postfix = " **TRUNCATED**"
        max_readme = (js_sizeof(pkg["readme"]) - diff - js_sizeof(postfix)) // 2
        smaller["readme"] = truncate_utf8_bytes(pkg["readme"], max_readme) + postfix
    if js_sizeof(smaller) - MAX_OBJ_SIZE > 0:
        smaller["readme"] = (
            "** TRUNCATED ** this package was too big, so non-essential information"
            " was removed"
        )
        smaller["versions"] = (
            {pkg["version"]: pkg["versions"][pkg["version"]]}
            if pkg.get("versions", {}).get(pkg.get("version"))
            else {}
        )
        smaller["tags"] = (
            {"latest": pkg["tags"]["latest"]}
            if (pkg.get("tags") or {}).get("latest")
            else {}
        )
        smaller["owners"] = [smaller["owner"]] if smaller.get("owner") else []
    if js_sizeof(smaller) - MAX_OBJ_SIZE > 0:
        return None
    return smaller


def format_package(
    doc: Any, now_ms: int, last_crawl_iso: str
) -> dict[str, Any] | None:
    """GetPackage doc -> RawPkg record (reference src/formatPkg.ts:63-208).

    Deterministic: the volatile fields (lastCrawl, _revision) are inputs.
    Returns None for dropped docs (unnamed / unlinkable / oversized).
    """
    cleaned = normalize_doc(doc)
    if not cleaned or not cleaned.get("name"):
        return None

    if isinstance(cleaned.get("main"), list):
        cleaned["main"] = cleaned["main"][0] if cleaned["main"] else None

    last_publisher = (
        _format_user(cleaned["lastPublisher"]) if cleaned.get("lastPublisher") else None
    )
    author = _get_author(cleaned)
    license_ = _get_license(cleaned)
    version = cleaned.get("version") or "0.0.0"
    versions = get_versions(cleaned["other"].get("time"), doc.get("versions"))

    github_repo = None
    default_repository: dict | None = None
    if cleaned.get("repository"):
        tmp = cleaned["repository"]
        if isinstance(tmp, list) and tmp:
            tmp = tmp[0]
        if isinstance(tmp, str):
            default_repository = {"type": "git", "url": tmp}
        elif isinstance(tmp, dict) and len(tmp) > 0:
            default_repository = tmp
        if default_repository and (
            not default_repository.get("type") or not default_repository.get("url")
        ):
            default_repository = None
        if default_repository:
            github_repo = get_github_repo_info(
                default_repository["url"], cleaned.get("gitHead")
            )

    if not github_repo and not last_publisher and not author:
        return None  # unlinkable (reference src/formatPkg.ts:116-118)

    repo_info = get_repository_info(default_repository)
    repository = None
    if default_repository and default_repository.get("url") and repo_info:
        repository = {
            "type": _s(default_repository.get("type")),
            **repo_info,
            "head": cleaned.get("gitHead"),
            "branch": cleaned.get("gitHead") or "master",
        }

    types = _get_types(cleaned)
    owner = _get_owner(repository, last_publisher, author)
    computed_keywords, computed_metadata = _get_computed(cleaned)
    keywords = _get_keywords(cleaned)
    alternative_names = get_alternative_names(cleaned["name"])
    module_types = get_module_types(cleaned)
    style_types = get_style_types(cleaned)
    # nice-package mutates the doc ref: dist-tags dangling on versions not in
    # `versions` are dropped (observed in the reference golden corpus —
    # create-instantsearch-app's beta tag; cf. formatPkg.ts:66 comment)
    tags = doc.get("dist-tags")
    if isinstance(tags, dict) and isinstance(doc.get("versions"), dict):
        tags = {k: v for k, v in tags.items() if v in doc["versions"]}
    dep = cleaned.get("deprecated")
    is_deprecated = dep is not None and dep is not False
    is_security_held = bool(
        repository
        and repository.get("host") == "github.com"
        and repository.get("user") == "npm"
        and repository.get("project") == "security-holder"
    )

    def js_str(v: Any) -> str:
        if v is True:
            return "true"
        if v is False:
            return "false"
        return str(v)

    raw_pkg: dict[str, Any] = {
        "objectID": cleaned["name"],
        "rev": cleaned["other"].get("_rev"),
        "name": cleaned["name"],
        "downloadsLast30Days": 0,
        "downloadsRatio": 0.0,
        "humanDownloadsLast30Days": human_number(0),
        "jsDelivrHits": 0,
        "popular": False,
        "version": version,
        "versions": _smap(versions),
        "tags": _smap(tags) if tags is not None else None,
        "description": _s(cleaned.get("description")) or None,
        "dependencies": _smap(cleaned.get("dependencies")),
        "devDependencies": _smap(cleaned.get("devDependencies")),
        "originalAuthor": cleaned["other"].get("author"),  # JSON-encoded post-escape
        "repository": repository,
        "githubRepo": github_repo,
        "gitHead": github_repo["head"] if github_repo else None,
        "readme": doc.get("readme"),
        "owner": owner,
        "deprecated": js_str(dep) if is_deprecated else "false",
        "isDeprecated": is_deprecated,
        "deprecatedReason": js_str(dep) if is_deprecated else None,
        "isSecurityHeld": is_security_held,
        "homepage": _get_homepage(cleaned),
        "license": license_,
        "keywords": keywords,
        "computedKeywords": computed_keywords,
        "computedMetadata": computed_metadata,
        "created": js_date_parse_ms(cleaned.get("created")),
        "modified": js_date_parse_ms(cleaned.get("modified")),
        "lastPublisher": last_publisher,
        "owners": [_format_user(u) for u in (cleaned.get("owners") or [])],
        "bin": _smap(cleaned.get("bin")),
        "humanDependents": "0",
        "dependents": 0,
        "types": types,
        "moduleTypes": module_types,
        "styleTypes": style_types,
        "changelogFilename": None,
        "lastCrawl": last_crawl_iso,
        "_revision": now_ms,
        "_searchInternal": {
            "alternativeNames": alternative_names,
            "popularAlternativeNames": [],
        },
    }
    truncated = _truncate_package(raw_pkg)
    if truncated is None:
        return None
    escaped = _escape_record(truncated)
    # dynamic-typed field -> fixed string column (schema choice, SURVEY.md §1.2)
    if escaped.get("originalAuthor") is not None:
        escaped["originalAuthor"] = json.dumps(escaped["originalAuthor"])
    return escaped


# ---------------------------------------------------------------------------
# Spark stage: Arrow-batched mapInPandas over (doc_id, raw_json [, seq])
# ---------------------------------------------------------------------------


def format_packages_df(raw_df, now_ms: int, last_crawl_iso: str):
    """raw_packages DataFrame -> packages DataFrame (strict PACKAGE schema).

    Arrow-batched: each pandas batch is a column of raw JSON strings; the
    per-doc transform is pure, so this stage is a narrow map (no shuffle).
    Dropped docs (unnamed/unlinkable/oversized) are filtered here, mirroring
    the reference's skip paths (src/formatPkg.ts:67-69,116-118,269-274).
    """
    import pandas as pd

    from .schema import PACKAGE

    out_schema = "doc_id string, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in PACKAGE.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .schema import PACKAGE as pkg_schema

        cols = ["doc_id"] + [f.name for f in pkg_schema.fields]
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["raw_json"]):
                try:
                    doc = json.loads(raw)
                except (TypeError, ValueError):
                    continue
                rec = format_package(doc, now_ms, last_crawl_iso)
                if rec is None:
                    continue
                rec["doc_id"] = doc_id
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return raw_df.select("doc_id", "raw_json").mapInPandas(run, schema=out_schema)

"""Golden parity of the formatPkg stage against the reference's own jest
snapshot corpus (SURVEY.md §5; north rule: span/record equality vs the
reference's formatPkg fixtures). Reference tests mirrored:
src/__tests__/formatPkg.test.ts."""

from __future__ import annotations

import json
import os

import pytest

from npm_search_spark.format_pkg import (
    format_package,
    get_alternative_names,
    get_export_keys,
    get_mains,
    get_repository_info,
    get_versions,
)
from tests.golden_compare import assert_parity

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
NOW_MS = 1_755_000_000_000
LAST_CRAWL = "2026-08-16T00:00:00.000Z"


def fmt(doc):
    return format_package(doc, NOW_MS, LAST_CRAWL)


@pytest.fixture(scope="module")
def goldens():
    with open(os.path.join(FIX, "format_pkg_golden.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def raw_packages():
    with open(os.path.join(FIX, "raw_packages.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def preact():
    with open(os.path.join(FIX, "preact.json")) as f:
        return json.load(f)


BASE = {
    "_id": "0",
    "dist-tags": {},
    "_rev": "rev-1",
    "name": "0",
    "maintainers": [],
    "readme": "",
    "readmeFilename": "",
    "time": {"created": "", "modified": ""},
    "versions": {},
    "repository": {"type": "git", "url": "https://github.com/algolia/npm-search"},
}

BASE_VERSION = {
    "_id": "",
    "description": "",
    "dist": {"shasum": "", "tarball": ""},
    "maintainers": [],
    "name": "",
    "version": "",
}


class TestGoldenCorpus:
    def test_raw_packages_parity(self, goldens, raw_packages):
        for doc in raw_packages:
            got = fmt(doc)
            key = f"general transforms correctly: {doc['_id']} 1"
            assert got is not None, doc["_id"]
            assert_parity(goldens[key], got)

    def test_deprecated(self, goldens):
        doc = {
            **BASE,
            "dist-tags": {"latest": "1.2.3"},
            "versions": {
                "1.2.3": {**BASE_VERSION, "deprecated": "Yes this is deprecated"}
            },
        }
        assert_parity(goldens["deprecated log deprecated reason and flag 1"], fmt(doc))

    def test_security_held(self, goldens):
        doc = {
            **BASE,
            "dist-tags": {"latest": "1.2.3"},
            "versions": {"1.2.3": {**BASE_VERSION}},
            "repository": "npm/security-holder",
            "author": {"name": "npm"},
        }
        got = fmt(doc)
        assert got["isSecurityHeld"] is True
        assert_parity(goldens["security held log security held flag 1"], got)

    def test_security_held_wrong_host(self, goldens):
        doc = {
            **BASE,
            "dist-tags": {"latest": "1.2.3"},
            "versions": {"1.2.3": {**BASE_VERSION}},
            "repository": "gitlab:npm/security-holder",
            "author": {"name": "npm"},
        }
        got = fmt(doc)
        assert got["isSecurityHeld"] is False
        assert_parity(
            goldens["security held only log security held flag for the correct repo 1"],
            got,
        )

    def test_truncates_long_readmes(self, goldens):
        doc = {**BASE, "name": "long-boy", "readme": "Hello, World! " * 40000}
        got = fmt(doc)
        assert got["readme"].endswith(" **TRUNCATED**")
        assert len(got["readme"]) < 475000
        assert_parity(
            goldens["general truncates long readmes 1"], got, skip={"rev", "lastCrawl", "_revision", "readme"}
        )

    def test_preact_module_types(self, preact):
        assert fmt(preact)["moduleTypes"] == ["esm"]

    def test_keeps_bin_intact(self, raw_packages):
        cia = next(p for p in raw_packages if p["name"] == "create-instantsearch-app")
        assert fmt(cia)["bin"] == {"create-instantsearch-app": "src/cli/index.js"}


class TestDropRules:
    def test_drop_unnamed(self):
        assert fmt({"_id": "x", "versions": {}}) is None

    def test_drop_unlinkable(self):
        # no repo, no publisher, no author (reference src/formatPkg.ts:116-118)
        assert fmt({**BASE, "repository": None, "maintainers": []}) is None


class TestComputedKeywords:
    def test_angular_schematics(self):
        got = fmt({**BASE, "name": "angular-cli-schema-1", "schematics": "bli-blo", "keywords": ["hi"]})
        assert got["keywords"] == ["hi"]
        assert got["computedKeywords"] == ["angular-cli-schematic"]
        assert got["computedMetadata"] == {"schematics": "bli-blo"}

    def test_babel_plugins(self):
        assert fmt({**BASE, "name": "@babel/plugin-dogs", "keywords": "babel"})["computedKeywords"] == ["babel-plugin"]
        assert fmt({**BASE, "name": "babel-plugin-dogs", "keywords": ["dogs"]})["computedKeywords"] == ["babel-plugin"]

    def test_vue_cli(self):
        for name in ("@vue/cli-plugin-dogs", "vue-cli-plugin-dogs", "@dogs/vue-cli-plugin-dogs"):
            assert fmt({**BASE, "name": name})["computedKeywords"] == ["vue-cli-plugin"]

    def test_yeoman(self):
        assert fmt({**BASE, "name": "generator-dogs", "keywords": ["yeoman-generator"]})["computedKeywords"] == ["yeoman-generator"]
        assert fmt({**BASE, "name": "foo-dogs", "keywords": ["yeoman-generator"]})["computedKeywords"] == []
        assert fmt({**BASE, "name": "generator-dogs", "keywords": ["foo"]})["computedKeywords"] == []

    def test_webpack_scaffold(self):
        assert fmt({**BASE, "name": "webpack-scaffold-cats"})["computedKeywords"] == ["webpack-scaffold"]
        assert fmt({**BASE, "name": "foo-dogs"})["computedKeywords"] == []


class TestTypes:
    def test_types_included(self):
        assert fmt({**BASE, "name": "xxx", "types": "./test.dts"})["types"]["ts"] == "included"
        assert fmt({**BASE, "name": "xxx", "typings": "./test.dts"})["types"]["ts"] == "included"


class TestRepositoryInfo:
    def test_shortcuts(self):
        for short, host in (("gitlab", "gitlab.com"), ("github", "github.com"), ("bitbucket", "bitbucket.org")):
            assert get_repository_info(f"{short}:user/repo") == {
                "host": host, "user": "user", "project": "repo", "path": "", "url": f"{short}:user/repo",
            }

    def test_http_urls_with_paths(self):
        assert get_repository_info("https://github.com/babel/babel/tree/master/packages/babel") == {
            "url": "https://github.com/babel/babel/tree/master/packages/babel",
            "host": "github.com", "user": "babel", "project": "babel",
            "path": "/tree/master/packages/babel",
        }
        assert get_repository_info("https://gitlab.com/user/repo/tree/master/packages/a-package")["path"] == "/tree/master/packages/a-package"
        assert get_repository_info(
            "https://bitbucket.org/user/repo/src/ae8df4cd0e809a789e3f96fd114075191c0d5c8b/packages/project1"
        )["path"] == "/src/ae8df4cd0e809a789e3f96fd114075191c0d5c8b/packages/project1"

    def test_git_plus_https(self):
        assert get_repository_info("git+https://bitbucket.org/atlassian/confluence-web-components.git") == {
            "host": "bitbucket.org", "user": "atlassian", "project": "confluence-web-components",
            "path": "", "url": "git+https://bitbucket.org/atlassian/confluence-web-components.git",
        }
        assert get_repository_info("https://bitbucket.org/2klicdev/2klic-sdk.git")["project"] == "2klic-sdk"

    def test_objects_and_directory(self):
        assert get_repository_info({"type": "git", "url": "https://github.com/webpack/webpack.git"}) == {
            "host": "github.com", "user": "webpack", "project": "webpack", "path": "",
            "url": "https://github.com/webpack/webpack.git",
        }
        assert get_repository_info(
            {"type": "git", "url": "https://github.com/facebook/react.git", "directory": "./packages/react-dom"}
        )["path"] == "packages/react-dom"
        got = get_repository_info({
            "type": "git",
            "url": "https://github.com/facebook/react/tree/master/packages/wrong",
            "directory": "./packages/react-dom",
        })
        assert got["path"] == "packages/react-dom"
        assert got["project"] == "react"

    def test_unparseable(self):
        assert get_repository_info("") is None
        assert get_repository_info(None) is None
        assert get_repository_info("aaaaaaaa") is None


class TestAlternativeNames:
    CASES = {
        "places": ["places", "places.js", "placesjs"],
        "places.js": ["placesjs", "places js", "places", "places.js"],
        "prismjs": ["prismjs", "prism"],
        "animate.css": ["animatecss", "animate css", "animate", "animate.css"],
        "tailwindcss": ["tailwindcss", "tailwind"],
        "@algolia/places.js": ["algoliaplacesjs", " algolia places js", "@algolia/places", "@algolia/places.js"],
        "this-is_a-dumb-name": [
            "thisisadumbname", "this is a dumb name",
            "this-is_a-dumb-name.js", "this-is_a-dumb-namejs", "this-is_a-dumb-name",
        ],
    }

    def test_all(self):
        for name, want in self.CASES.items():
            assert get_alternative_names(name) == want, name


class TestModuleTypes:
    def _with_version(self, **ver):
        return {
            **BASE,
            "name": "irrelevant",
            "dist-tags": {"latest": "1.0.0"},
            "versions": {"1.0.0": {**BASE_VERSION, **ver}},
        }

    def test_matrix(self):
        assert fmt(self._with_version(type="module"))["moduleTypes"] == ["esm"]
        assert fmt(self._with_version(type="commonjs"))["moduleTypes"] == ["cjs"]
        assert fmt(self._with_version(module="index.js"))["moduleTypes"] == ["esm"]
        assert fmt(self._with_version(main="index.mjs"))["moduleTypes"] == ["esm"]
        assert fmt(self._with_version(main="index.cjs"))["moduleTypes"] == ["cjs"]
        assert fmt({**BASE, "name": "irrelevant"})["moduleTypes"] == ["unknown"]
        assert fmt(self._with_version(main=[{"personalMain": "index.mjs"}]))["moduleTypes"] == ["unknown"]


class TestGetMains:
    def test_all(self):
        assert get_mains("index.js") == ["index.js"]
        assert get_mains(["index.js", "ondex.jsx"]) == ["index.js", "ondex.jsx"]
        assert get_mains(None) == ["index.js"]
        assert get_mains({"something": "cool.js"}) == []


class TestGetExportKeys:
    def test_all(self):
        assert get_export_keys(None) == []
        assert get_export_keys({"import": "./lol.js", "require": "./cjs.js"}) == ["import", "require"]
        assert get_export_keys({".": {"import": "./lol.js", "require": "./cjs.js"}}) == [".", "import", "require"]
        assert get_export_keys({
            "something": {"import": "./lol.js", "require": "./cjs.js"},
            "bazoo": {"import": "./bazoo.js", "require": "./cjs.js"},
        }) == ["something", "bazoo", "import", "require", "import", "require"]
        assert get_export_keys({
            "something": {"import": "./lol.js", "require": "./cjs.js"},
            "bazoo": {
                "lol": {"import": "./bazoo.js", "require": "./cjs.js"},
                "kol": "test.js",
                "mol": {"bol": {"condition": "test.js"}},
            },
        }) == ["something", "bazoo", "import", "require", "lol", "kol", "mol", "import", "require", "bol", "condition"]


class TestStyleTypes:
    def _style(self, style):
        return {
            **BASE,
            "dist-tags": {"latest": "1.0.0"},
            "versions": {"1.0.0": {**BASE_VERSION, "style": style}},
        }

    def test_matrix(self):
        assert fmt(self._style("/style.min.css"))["styleTypes"] == ["css"]
        assert fmt(self._style("/font.woff"))["styleTypes"] == ["woff"]
        assert fmt(self._style("/STYLE.SCSS"))["styleTypes"] == ["scss"]
        assert fmt(self._style(""))["styleTypes"] == []
        assert fmt({**BASE})["styleTypes"] == []


class TestGetVersions:
    def test_time_intersection(self):
        time = {"created": "a", "modified": "b", "1.2.3": "2020-04-04T01:04:57.069Z"}
        assert get_versions(time, {"1.2.3": {}}) == {"1.2.3": "2020-04-04T01:04:57.069Z"}

    def test_drops_missing_versions(self):
        time = {
            "created": "2020-04-04T01:04:57.069Z",
            "modified": "2030-04-04T01:04:57.069Z",
            "9000.10000.5": "3020-04-04T01:04:57.069Z",
            "1.2.3": "2020-04-04T01:04:57.069Z",
            "2.3.4": "2020-04-04T01:04:57.069Z",
        }
        assert get_versions(time, {"1.2.3": {}, "2.3.4": {}}) == {
            "1.2.3": "2020-04-04T01:04:57.069Z",
            "2.3.4": "2020-04-04T01:04:57.069Z",
        }


class TestNicePackageStage:
    def test_nice_preact_golden(self, goldens, preact):
        from npm_search_spark.format_pkg import normalize_doc

        got = normalize_doc(preact)
        g = goldens["nice-package should nice preact 1"]
        assert got["repository"] == g["repository"]  # github URL normalized to string
        assert got["created"] == g["created"]
        assert got["modified"] == g["modified"]
        assert got["starsCount"] == g["starsCount"]
        assert got["lastPublisher"] == g["lastPublisher"]
        assert got["version"] == g["version"]
        # snapshot predates the fixture (has a stale _attachments key) — compare
        # against keys actually present in the input doc
        want = {k for k in g["other"] if k in preact or k in preact["versions"]["8.5.0"]}
        assert set(got["other"].keys()) == want

    def test_nice_atlaskit_golden(self, goldens, raw_packages):
        from npm_search_spark.format_pkg import normalize_doc

        doc = next(p for p in raw_packages if p["_id"] == "@atlaskit/input")
        got = normalize_doc(doc)
        g = goldens["nice-package should nice atlaskit 1"]
        assert got["repository"] == g["repository"]  # bitbucket object kept
        assert got["gitHead"] == g["gitHead"]
        assert got["owners"] == g["owners"]
        latest = doc["versions"][doc["dist-tags"]["latest"]]
        want = {k for k in g["other"] if k in doc or k in latest}
        assert set(got["other"].keys()) == want

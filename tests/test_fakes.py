"""Differential tests pinning the vendored test doubles to DOCUMENTED
real-library behavior (round-2 verdict #6).

The store and app suites exercise ``store/mongo.py`` and
``app/streamlit_app.py`` through ``testing/fake_mongo`` /
``testing/fake_streamlit`` — doubles written by the same author as the
code under test, so a shared misunderstanding would pass silently.
Each test here asserts one contract of the REAL library, quoted from
its documentation, on an operation the store/app actually performs; if
the fake drifts from that contract, it fails here rather than on a
live server.

Contracts pinned (sources: pymongo API reference — Collection.insert_one,
Collection.update_one, Cursor; MongoDB manual — $group, BSON comparison
order, document size limit; Streamlit docs — st.rerun, st.button,
st.session_state, st.cache_resource).
"""

from __future__ import annotations

import pytest

from rgnir_tpu.testing import fake_mongo as fm
from rgnir_tpu.testing import fake_streamlit
from rgnir_tpu.testing.fake_streamlit import AppHarness

fake_streamlit.install()


@pytest.fixture()
def col():
    return fm.Collection("t")


class TestFakeMongoCursorContract:
    """pymongo Cursor: lazy, single-use, server-side sort/skip/limit."""

    def test_find_is_lazy(self, col):
        """'Cursors are lazy — the query is not sent to the server
        until you start iterating': a write between find() and
        iteration IS visible (store code must not assume a snapshot)."""
        col.insert_one({"k": 1})
        cur = col.find({})
        col.insert_one({"k": 2})
        assert sorted(d["k"] for d in cur) == [1, 2]

    def test_cursor_exhausts_after_one_pass(self, col):
        """A cursor streams results once; re-iterating an exhausted
        cursor yields nothing (list(cur) twice != two result sets)."""
        col.insert_one({"k": 1})
        cur = col.find({})
        assert len(list(cur)) == 1
        assert list(cur) == []

    def test_sort_skip_limit_server_order(self, col):
        """sort/skip/limit apply in that order server-side REGARDLESS
        of the order the cursor methods were chained in."""
        for k in [3, 1, 4, 1, 5, 9, 2, 6]:
            col.insert_one({"k": k})
        chained_one_way = [
            d["k"] for d in col.find({}).sort("k", fm.ASCENDING).skip(2).limit(3)
        ]
        chained_other_way = [
            d["k"] for d in col.find({}).limit(3).skip(2).sort("k", fm.ASCENDING)
        ]
        assert chained_one_way == chained_other_way == [2, 3, 4]

    def test_missing_field_sorts_as_null_lowest(self, col):
        """BSON comparison order: Null sorts before all numbers, and a
        missing field compares as null — so docs without the sort key
        come FIRST ascending and LAST descending (the store's
        newest-first listing relies on descending order)."""
        col.insert_one({"k": 5, "tag": "five"})
        col.insert_one({"tag": "missing"})
        col.insert_one({"k": 1, "tag": "one"})
        asc = [d["tag"] for d in col.find({}).sort("k", fm.ASCENDING)]
        desc = [d["tag"] for d in col.find({}).sort("k", fm.DESCENDING)]
        assert asc == ["missing", "one", "five"]
        assert desc == ["five", "one", "missing"]

    def test_projection_id_default(self, col):
        """_id is included by default and excluded only by _id: 0."""
        col.insert_one({"k": 1, "v": 2})
        with_default = col.find_one({"k": 1}, {"k": 1})
        assert "_id" in with_default and "v" not in with_default
        without = col.find_one({"k": 1}, {"_id": 0, "k": 1})
        assert without == {"k": 1}


class TestFakeMongoWriteContract:
    def test_insert_one_mutates_callers_doc_with_id(self, col):
        """insert_one adds _id to the ORIGINAL document when absent
        (documented pymongo side effect)."""
        doc = {"k": 1}
        res = col.insert_one(doc)
        assert doc["_id"] == res.inserted_id

    def test_duplicate_key_is_e11000(self, col):
        """A duplicate _id raises DuplicateKeyError whose message
        carries the server's E11000 code (the store's error
        classification greps for it)."""
        res = col.insert_one({"k": 1})
        with pytest.raises(fm.DuplicateKeyError, match="E11000"):
            col.insert_one({"_id": res.inserted_id, "k": 2})

    def test_document_too_large_at_16mb(self, col):
        """The BSON document size limit is exactly 16 MiB (16777216
        bytes); the store's image-size guard mirrors it."""
        assert fm.MAX_DOC_BYTES == 16 * 1024 * 1024
        with pytest.raises(fm.DocumentTooLarge):
            col.insert_one({"blob": fm.Binary(b"x" * (16 * 1024 * 1024))})

    def test_update_one_modified_vs_matched(self, col):
        """modified_count counts actual changes: $set to the value
        already present reports matched 1 / modified 0."""
        col.insert_one({"k": 1, "v": "a"})
        r1 = col.update_one({"k": 1}, {"$set": {"v": "b"}})
        assert (r1.matched_count, r1.modified_count) == (1, 1)
        r2 = col.update_one({"k": 1}, {"$set": {"v": "b"}})
        assert (r2.matched_count, r2.modified_count) == (1, 0)
        r3 = col.update_one({"k": 99}, {"$set": {"v": "c"}})
        assert (r3.matched_count, r3.modified_count) == (0, 0)

    def test_delete_one_deletes_at_most_one(self, col):
        col.insert_one({"k": 1})
        col.insert_one({"k": 1})
        assert col.delete_one({"k": 1}).deleted_count == 1
        assert col.count_documents({"k": 1}) == 1


class TestFakeMongoGroupContract:
    def test_group_output_order_is_not_insertion_order(self, col):
        """'$group does not order its output documents' — the fake
        deliberately emits groups in NON-first-seen order, so any
        consumer (the dedupe aggregation) accidentally relying on
        insertion order fails here instead of on a real server."""
        for h in ["a", "b", "a", "c"]:
            col.insert_one({"hash": h})
        pipeline = [
            {"$group": {"_id": "$hash", "ids": {"$push": "$_id"},
                        "count": {"$sum": 1}}},
        ]
        out = list(col.aggregate(pipeline))
        keys = [g["_id"] for g in out]
        assert sorted(keys) == ["a", "b", "c"]
        assert keys != ["a", "b", "c"]  # first-seen order would be abc
        counts = {g["_id"]: g["count"] for g in out}
        assert counts == {"a": 2, "b": 1, "c": 1}

    def test_group_push_preserves_document_order(self, col):
        """$push accumulates in the order documents reach the stage —
        the dedupe keeps ids[0] (the earliest insert) and deletes the
        rest, which is only correct if push order is document order."""
        ids = [col.insert_one({"hash": "a", "i": i}).inserted_id
               for i in range(3)]
        (grp,) = col.aggregate(
            [{"$group": {"_id": "$hash", "ids": {"$push": "$_id"}}}]
        )
        assert grp["ids"] == ids

    def test_unknown_stage_raises_loudly(self, col):
        """The fake must never silently no-op an unimplemented stage."""
        with pytest.raises(NotImplementedError):
            list(col.aggregate([{"$lookup": {}}]))


class TestFakeStreamlitContract:
    """Documented Streamlit execution semantics the app relies on."""

    def test_rerun_stops_script_immediately(self):
        """'st.rerun() ... the script is halted immediately': no code
        after the call runs, and the script restarts from the top."""
        trace = []

        def app():
            import streamlit as st  # installed fake

            trace.append("top")
            if not st.session_state.get("done"):
                st.session_state["done"] = True
                st.rerun()
                trace.append("after-rerun")  # must never run
            trace.append("settled")

        AppHarness(app).run()
        assert trace == ["top", "top", "settled"]

    def test_button_true_for_exactly_one_run(self):
        """'Button return values are not persisted': True only on the
        run triggered by the click, False on every later run — the
        app's two-step delete confirm depends on this."""
        seen = []

        def app():
            import streamlit as st

            seen.append(st.button("Delete"))

        h = AppHarness(app)
        h.run()
        h.click("Delete").run()
        h.run()
        assert seen == [False, True, False]

    def test_button_false_after_triggered_rerun(self):
        """A rerun triggered during the click's run reverts the button
        to False (the documented cause of lost-click bugs)."""
        seen = []

        def app():
            import streamlit as st

            seen.append(st.button("Go"))
            if seen[-1]:
                st.rerun()

        AppHarness(app).click("Go").run()
        assert seen == [True, False]

    def test_session_state_attr_and_key_equivalent(self):
        """st.session_state.x and st.session_state['x'] are the same
        entry; reading a missing attribute raises AttributeError (not
        None), deleting a missing attribute raises too."""

        def app():
            import streamlit as st

            st.session_state.a = 1
            assert st.session_state["a"] == 1
            st.session_state["b"] = 2
            assert st.session_state.b == 2
            with pytest.raises(AttributeError):
                _ = st.session_state.never_set
            with pytest.raises(AttributeError):
                del st.session_state.never_set

        AppHarness(app).run()

    def test_session_state_persists_across_reruns(self):
        counts = []

        def app():
            import streamlit as st

            st.session_state["n"] = st.session_state.get("n", 0) + 1
            counts.append(st.session_state["n"])

        h = AppHarness(app)
        h.run()
        h.run()
        assert counts == [1, 2]

    def test_cache_resource_calls_underlying_once(self):
        """st.cache_resource memoizes across reruns; .clear() drops the
        cached value (the app caches its store connection this way)."""
        calls = []

        def app():
            import streamlit as st

            @st.cache_resource
            def connect():
                calls.append(1)
                return object()

            a = connect()
            b = connect()
            assert a is b
            if st.session_state.get("clear_now"):
                connect.clear()
                st.session_state["clear_now"] = False
                connect()

        h = AppHarness(app)
        h.run()
        h.run()
        assert len(calls) == 1
        h.state["clear_now"] = True
        h.run()
        assert len(calls) == 2

    def test_rerun_loop_guard(self):
        """An app that reruns forever must fail loudly, not hang."""

        def app():
            import streamlit as st

            st.rerun()

        with pytest.raises(RuntimeError, match="did not settle"):
            AppHarness(app).run()

    def test_widget_returns_default_until_scripted(self):
        got = []

        def app():
            import streamlit as st

            got.append(st.text_input("Name", value="dflt", key="name"))

        h = AppHarness(app)
        h.run()
        h.set("name", "typed").run()
        assert got == ["dflt", "typed"]

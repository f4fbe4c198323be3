"""D2/D3 contract enforcement in the pipeline: a duplicate row in bronze
must fail that branch (reference 'Data Contains Duplicate Rows')."""

import copy
import datetime
import json

from rustcheatersdatapipeline_spark.pipeline import run_batch

from .fixtures import FIXTURES, write_fixtures

INTERVAL_END = datetime.datetime(2022, 1, 15, 12, 0, 0)


def test_duplicate_bronze_rows_fail_fact_branch(spark, tmp_path):
    paths = write_fixtures(tmp_path)
    # duplicate one friend entry → friends_fact emits a full duplicate row
    doc = copy.deepcopy(FIXTURES["player_friendlists"])
    friends = doc["responses"][0]["friendslist"]["friends"]
    friends.append(dict(friends[0]))
    with open(paths["player_friendlists"], "w") as fh:
        fh.write(json.dumps(doc))

    res = run_batch(spark, str(tmp_path), INTERVAL_END)
    assert "friends_fact" in res.failed
    assert "Duplicate" in res.failed["friends_fact"]
    # dims dedup away the duplicate, so they survive
    assert "friend_dim" not in res.failed and "relationship_dim" not in res.failed
    assert not res.succeeded

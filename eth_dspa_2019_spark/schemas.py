"""Schemas for the social-network Activity model.

The reference encodes five activity subtypes in a positional pipe format
(`SN/util/Activity.java:114-289`):

    P|id|personId|creationDate|imageFile|locationIP|browserUsed|language|content|tags|forumId|placeId
    C|id|personId|creationDate|locationIP|browserUsed|content|reply_to_postId|(empty)|placeId
    C|id|personId|creationDate|locationIP|browserUsed|content|(empty)|reply_to_commentId|placeId
    L|Person.id|Post.id|creationDate
    T|postId|creationDate

Comment-vs-Reply is decided by which reply_to field is empty
(`SN/util/Activity.java:188-193`). Here all subtypes parse into ONE unified
DataFrame with a ``kind`` discriminator and nullable per-kind columns —
ids widened to LongType for 100-TB headroom (declared superset of the
reference's Integer ids, SURVEY.md §1.6). The ``-1`` unresolved-postId
sentinel is kept only for replies (`SN/util/Activity.java:40`); every other
inapplicable field is NULL.
"""

from __future__ import annotations

from pyspark.sql import types as T

KIND_POST = "post"
KIND_COMMENT = "comment"
KIND_REPLY = "reply"
KIND_LIKE = "like"
KIND_TOMBSTONE = "tombstone"

UNRESOLVED = -1  # reply postId before resolution (`SN/util/Activity.java:40`)

#: Unified activity frame produced by sources.activity.parse_activities.
ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("id", T.LongType(), True),  # activity id (likes: liked post)
        T.StructField("person_id", T.LongType(), True),
        T.StructField("creation_date", T.StringType(), True),  # raw wire string
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ts_ms", T.LongType(), True),  # epoch millis (GMT)
        T.StructField("post_id", T.LongType(), True),  # -1 = unresolved reply
        T.StructField("parent_id", T.LongType(), True),  # replies only
        T.StructField("content", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.LongType()), True),  # posts only
        T.StructField("image_file", T.StringType(), True),
        T.StructField("location_ip", T.StringType(), True),
        T.StructField("browser", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("forum_id", T.LongType(), True),
        T.StructField("place_id", T.LongType(), True),
    ]
)

#: person_* static side tables (`SN/util/Config.java:73-82`): an edge list
#: person -> object per relation (knows / hasInterest / isLocatedIn /
#: studyAt / workAt); extra columns of the reference CSVs are dropped on
#: load exactly as the reference ignores them
#: (`SN/task/recommendation/FriendRecommender.java:158-194`).
PERSON_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("person_id", T.LongType(), False),
        T.StructField("object_id", T.LongType(), False),
    ]
)

"""Bundled synonym table for the METEOR synonym-match stage.

The reference's METEOR jar (1.5) runs a WordNet-synonymy module whose
data assets no longer ship upstream
(/root/reference/tools/python2_coco_eval/pycocoevalcap/meteor/meteor.py:80,
`.MISSING_LARGE_BLOBS`), and this image has no WordNet corpus either.
This module bundles a curated synonym table (WordNet-style synsets over
the vocabulary that dominates image/video captions — objects, people,
motion/posture verbs, attributes) and exposes it through two interfaces:

* ``synonyms(word) -> frozenset`` — the word's synonym candidates
  (always includes the word itself),
* ``WordnetLike`` — an object with the ``synsets(word)`` /
  ``.lemmas()`` / ``.name()`` shape of nltk's wordnet reader, so the
  exact same table can be injected into
  ``nltk.translate.meteor_score(..., wordnet=...)`` — which is how
  tests/test_captions_metrics.py cross-validates this framework's METEOR
  alignment against nltk's independent implementation stage by stage.

A word may appear in several groups (senses); its synonym set is the
union, which matches how the METEOR matcher consumes WordNet (any shared
synset member counts as a synonym match).
"""

# Each tuple is one synset-style group.  Keep entries lowercase,
# single-word (the METEOR unigram matcher never matches phrases).
SYNONYM_GROUPS = [
    # people
    ("man", "guy", "gentleman", "male"),
    ("woman", "lady", "female"),
    ("child", "kid", "youngster"),
    ("boy", "lad"),
    ("girl", "lass"),
    ("person", "individual", "human", "somebody", "someone"),
    ("people", "persons", "folks", "crowd"),
    ("baby", "infant", "toddler"),
    # animals
    ("dog", "puppy", "canine", "pup", "hound"),
    ("cat", "kitten", "feline", "kitty"),
    ("bird", "fowl"),
    ("horse", "pony", "stallion", "mare"),
    ("cow", "cattle", "bovine"),
    ("rabbit", "bunny", "hare"),
    ("pig", "hog", "swine"),
    ("sheep", "lamb"),
    # vehicles
    ("car", "automobile", "auto", "vehicle", "sedan"),
    ("bike", "bicycle", "cycle"),
    ("motorcycle", "motorbike"),
    ("bus", "coach"),
    ("truck", "lorry"),
    ("boat", "ship", "vessel"),
    ("plane", "airplane", "aircraft", "jet"),
    ("train", "railway", "locomotive"),
    # places / scenes
    ("street", "road", "roadway", "avenue"),
    ("sidewalk", "pavement", "walkway"),
    ("house", "home", "residence", "dwelling"),
    ("shop", "store", "boutique"),
    ("beach", "shore", "seashore", "seaside"),
    ("forest", "woods", "woodland"),
    ("hill", "mound", "knoll"),
    ("mountain", "mount", "peak"),
    ("sea", "ocean"),
    ("lake", "pond"),
    ("river", "stream", "creek"),
    ("field", "meadow", "pasture"),
    ("yard", "garden", "lawn"),
    ("kitchen", "cookery"),
    ("restaurant", "diner", "eatery", "cafe"),
    ("city", "town", "metropolis"),
    # objects
    ("picture", "image", "photo", "photograph"),
    ("television", "tv", "telly"),
    ("phone", "telephone", "cellphone", "smartphone", "mobile"),
    ("computer", "laptop", "pc"),
    ("sofa", "couch", "settee"),
    ("table", "desk"),
    ("cup", "mug"),
    ("glass", "tumbler"),
    ("plate", "dish"),
    ("bag", "sack", "handbag", "purse"),
    ("hat", "cap"),
    ("shirt", "top", "tee"),
    ("trousers", "pants", "slacks", "jeans"),
    ("shoes", "sneakers", "trainers", "footwear"),
    ("ball", "sphere"),
    ("stick", "rod", "pole", "bat"),
    ("rock", "stone", "boulder"),
    ("gift", "present"),
    ("trash", "garbage", "rubbish", "waste"),
    ("food", "meal", "dish"),
    ("couple", "pair", "duo", "two"),
    ("group", "bunch", "cluster", "gathering"),
    # motion verbs (with common inflections, since the synonym stage
    # runs on surface forms after exact+stem already consumed the rest)
    ("run", "sprint", "jog", "dash", "race"),
    ("runs", "sprints", "jogs", "dashes", "races"),
    ("running", "sprinting", "jogging", "dashing", "racing"),
    ("walk", "stroll", "amble", "hike"),
    ("walks", "strolls", "ambles", "hikes"),
    ("walking", "strolling", "ambling", "hiking"),
    ("jump", "leap", "hop", "bound"),
    ("jumps", "leaps", "hops", "bounds"),
    ("jumping", "leaping", "hopping", "bounding"),
    ("throw", "toss", "hurl", "fling"),
    ("throws", "tosses", "hurls", "flings"),
    ("throwing", "tossing", "hurling", "flinging"),
    ("catch", "grab", "seize", "snatch"),
    ("catches", "grabs", "seizes", "snatches"),
    ("hold", "grip", "grasp", "clutch"),
    ("holds", "grips", "grasps", "clutches"),
    ("holding", "gripping", "grasping", "clutching"),
    ("look", "gaze", "stare", "glance", "watch"),
    ("looks", "gazes", "stares", "glances", "watches"),
    ("looking", "gazing", "staring", "glancing", "watching"),
    ("talk", "speak", "chat", "converse"),
    ("talks", "speaks", "chats", "converses"),
    ("talking", "speaking", "chatting", "conversing"),
    ("eat", "consume", "devour", "dine"),
    ("eats", "consumes", "devours", "dines"),
    ("eating", "consuming", "devouring", "dining"),
    ("ride", "mount"),
    ("rides", "mounts"),
    ("riding", "mounting"),
    ("sit", "perch", "rest"),
    ("sits", "perches", "rests"),
    ("sitting", "perching", "seated", "resting"),
    ("stand", "rise"),
    ("standing", "upright"),
    ("sleep", "doze", "nap", "slumber"),
    ("sleeping", "dozing", "napping", "slumbering"),
    ("play", "frolic"),
    ("plays", "frolics"),
    ("playing", "frolicking"),
    ("cut", "slice", "chop", "carve"),
    ("cuts", "slices", "chops", "carves"),
    ("cutting", "slicing", "chopping", "carving"),
    ("make", "create", "build", "construct", "prepare"),
    ("makes", "creates", "builds", "constructs", "prepares"),
    ("making", "creating", "building", "constructing", "preparing"),
    ("begin", "start", "commence"),
    ("begins", "starts", "commences"),
    ("climb", "ascend", "scale"),
    ("climbs", "ascends", "scales"),
    ("climbing", "ascending", "scaling"),
    ("fall", "drop", "tumble"),
    ("falls", "drops", "tumbles"),
    ("falling", "dropping", "tumbling"),
    ("push", "shove"),
    ("pull", "tug", "drag"),
    ("carry", "haul", "tote"),
    ("carries", "hauls", "totes"),
    ("carrying", "hauling", "toting"),
    ("smile", "grin"),
    ("smiling", "grinning"),
    ("shout", "yell", "scream", "holler"),
    ("shouting", "yelling", "screaming", "hollering"),
    # attributes
    ("big", "large", "huge", "enormous", "giant"),
    ("small", "little", "tiny", "miniature"),
    ("fast", "quick", "rapid", "speedy", "swift"),
    ("quickly", "rapidly", "swiftly", "speedily"),
    ("slow", "sluggish", "unhurried"),
    ("slowly", "sluggishly"),
    ("happy", "glad", "joyful", "cheerful", "pleased"),
    ("sad", "unhappy", "sorrowful", "gloomy"),
    ("pretty", "beautiful", "lovely", "attractive", "gorgeous"),
    ("ugly", "unattractive", "hideous"),
    ("old", "elderly", "aged", "ancient"),
    ("young", "youthful", "juvenile"),
    ("new", "fresh", "brand-new"),
    ("dirty", "filthy", "grimy", "soiled"),
    ("clean", "spotless", "tidy"),
    ("wet", "damp", "soaked", "moist"),
    ("dry", "arid", "parched"),
    ("cold", "chilly", "freezing", "frigid"),
    ("hot", "scorching", "boiling"),
    ("bright", "vivid", "brilliant", "luminous"),
    ("dark", "dim", "gloomy", "shadowy"),
    ("red", "crimson", "scarlet"),
    ("blue", "azure", "navy"),
    ("smart", "intelligent", "clever", "bright"),
    ("angry", "mad", "furious", "irate"),
    ("scared", "afraid", "frightened", "terrified"),
    ("tired", "weary", "exhausted", "fatigued"),
    ("funny", "amusing", "humorous", "comical"),
    ("strange", "odd", "weird", "peculiar"),
    ("near", "close", "nearby"),
    ("far", "distant", "remote"),
    ("many", "numerous", "several"),
    ("start", "beginning", "outset"),
    ("end", "finish", "conclusion"),
    ("top", "summit", "peak"),
    ("bottom", "base", "foot"),
    ("middle", "center", "midst"),
    ("front", "fore"),
    ("back", "rear", "behind"),
]

_TABLE = None


def _table():
    global _TABLE
    if _TABLE is None:
        table = {}
        for group in SYNONYM_GROUPS:
            gset = frozenset(group)
            for w in group:
                prev = table.get(w)
                table[w] = gset if prev is None else prev | gset
        _TABLE = table
    return _TABLE


def synonyms(word):
    """All synonym candidates of ``word`` (including itself)."""
    return _table().get(word, frozenset()) | {word}


class _Lemma:
    __slots__ = ("_n",)

    def __init__(self, name):
        self._n = name

    def name(self):
        return self._n


class _Synset:
    __slots__ = ("_lemmas",)

    def __init__(self, words):
        self._lemmas = [_Lemma(w) for w in words]

    def lemmas(self):
        return self._lemmas


class WordnetLike:
    """Duck-typed stand-in for nltk.corpus.wordnet over the bundled
    table: ``synsets(word)`` returns one synset per group containing the
    word.  Inject into nltk.translate.meteor_score(wordnet=...) to run
    nltk's METEOR on exactly this synonymy."""

    def synsets(self, word):
        groups = [g for g in SYNONYM_GROUPS if word in g]
        return [_Synset(g) for g in groups]


wordnet_like = WordnetLike()
